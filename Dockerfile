# Container recipe for the graft event-store server — the analogue of
# the reference's two-stage Dockerfile (rust build -> slim runtime,
# unprivileged user, EXPOSE 8080, VOLUME for the stream database).
#
# NOT buildable in this repo's zero-egress dev environment (both
# stages pull public images); it exists so a user following the
# reference's README deployment path has an equivalent here. The env
# contract is ServerMain's: GRAFT_STREAMS_DIR / GRAFT_OIDC_URL /
# GRAFT_JWT_AUD (the reference's HEMATITE_* trio, renamed).

# ---- build stage: compile the library jar against the Spark dist ----
FROM docker.io/sbtscala/scala-sbt:eclipse-temurin-17.0.13_11_1.10.7_2.13.15 AS build
WORKDIR /app
# the runtime image below ships Spark at /opt/spark; compile against
# the same jars so the classpath is identical in both stages
COPY --from=docker.io/apache/spark:4.1.2 /opt/spark/jars /opt/spark/jars
COPY build.sbt /app/
COPY project /app/project
COPY src/main /app/src/main
RUN sbt -batch package && \
    cp target/scala-2.13/*.jar /graft.jar

# ---- runtime stage: Spark dist + the jar, unprivileged -------------
FROM docker.io/apache/spark:4.1.2 AS final
USER root
ARG UID=10001
RUN useradd --no-create-home --home-dir /nonexistent \
      --shell /usr/sbin/nologin --uid "${UID}" appuser && \
    mkdir -p /var/lib/graft/streams && chown -R appuser /var/lib/graft
USER appuser

COPY --from=build /graft.jar /opt/graft/graft.jar

ENV GRAFT_STREAMS_DIR="/var/lib/graft/streams"
# GRAFT_OIDC_URL and GRAFT_JWT_AUD must be provided at run time; the
# server fails fast at boot without them (ServerMain.boot), exactly as
# the reference's env::var(...).expect chain does.

EXPOSE 8080
VOLUME ["/var/lib/graft"]

# JDK17 module opens: SparkSession is created outside spark-submit, so
# the launcher's defaultModuleOptions() must be passed explicitly —
# same list as build.sbt's jdk17AddOpens.
CMD ["/bin/bash", "-c", "exec java \
  --add-opens=java.base/java.lang=ALL-UNNAMED \
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens=java.base/java.io=ALL-UNNAMED \
  --add-opens=java.base/java.net=ALL-UNNAMED \
  --add-opens=java.base/java.nio=ALL-UNNAMED \
  --add-opens=java.base/java.util=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens=java.base/sun.security.action=ALL-UNNAMED \
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED \
  -cp '/opt/graft/graft.jar:/opt/spark/jars/*' graft.api.ServerMain"]
