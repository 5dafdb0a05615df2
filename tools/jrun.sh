#!/bin/bash
# Plain-java runner for graft mains (bypasses the sbt lock so heavy
# jobs can run concurrently with the test suite).
MAIN=$1; shift
CP="/root/repo/target/scala-2.13/classes:/opt/spark/jars/*"
AO=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  AO="$AO --add-opens $p=ALL-UNNAMED"
done
exec java $AO $JRUN_OPTS -Xmx${JRUN_MEM:-8g} -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" "$MAIN" "$@"
