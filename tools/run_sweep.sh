#!/bin/bash
# Dev helper: run StatelessSweep without sbt. Snapshots the compiled
# classes first so a concurrent `sbt compile` cannot corrupt the run.
SNAP=$(mktemp -d /tmp/sweep_classes.XXXX)
cp -r /root/repo/target/scala-2.13/classes/* "$SNAP/"
CP="$SNAP:/opt/spark/jars/*"
OPENS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
java $OPENS -Xmx16g -Dspark.ui.enabled=false -cp "$CP" graft.tools.StatelessSweep "$@"
rc=$?
rm -rf "$SNAP"
exit $rc
