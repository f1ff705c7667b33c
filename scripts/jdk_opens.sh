# JPMS --add-opens flags for raw `java` launches of Spark 4 mains (sourced
# by the probe/gate scripts; sbt-forked runs get the same list from
# build.sbt). Matches org.apache.spark.launcher.JavaModuleOptions. Without
# them the common paths work, but block eviction under memory pressure hits
# Kryo reflection over java.nio (HeapByteBuffer) and kills the job — seen
# reproducibly profiling LPA at the 100x corpus with a doubled checkpoint
# footprint.
JDK_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  JDK_OPENS="$JDK_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  JDK_OPENS="$JDK_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
export JDK_OPENS
