#!/usr/bin/env bash
# Run a graft main class directly against the compiled classes + Spark jars
# (avoids sbt startup per invocation). Usage: tools/run.sh graft.Verify ARGS...
set -euo pipefail
CLS="$1"; shift
# classpath from THIS script's checkout (not a hardcoded /root/repo):
# a worktree/second checkout must run its own classes — round-16
# lesson: the hardcoded path silently ran the main tree's binaries
# from a worktree, voiding an A/B's "before" arm
ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
CP="$ROOT/target/scala-2.13/classes:/opt/spark/jars/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$CLS" "$@"
