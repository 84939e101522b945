#!/bin/bash
# Run a graft main against the compiled classes + Spark jars without sbt
# (keeps the sbt project lock free during long tmux runs).
cd /root/repo
# Fixed-size, pre-touched heap: with a growable heap the probe JVMs spent
# up to 93% of wall-clock in the KERNEL mid-measurement (vmstat `sy`, zero
# steal) — G1 uncommits memory after each between-runs GC, and the next
# timed run re-faults tens of GB of zeroed pages. Pinning Xms=Xmx and
# pre-touching moves every page fault to JVM startup, before any timer.
exec java -Xms64g -Xmx64g -XX:+AlwaysPreTouch \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -Dio.netty.tryReflectionSetAccessible=true \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
