#!/bin/bash
# Launch a graft main against the sbt-compiled classes + /opt/spark jars
# without going through sbt (so it can run while sbt test holds the lock).
# Usage: tools/run_main.sh graft.ScaleUp 10 target/scaledata/sf1
MAIN="$1"; shift
# GRAFT_XMX: sf100 rehearsals OOM'd the 125 GiB box at -Xmx96g when a second
# JVM (sbt) was resident — 80g leaves headroom for sbt + page cache.
exec java -Xmx"${GRAFT_XMX:-96g}" \
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
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$MAIN" "$@"
