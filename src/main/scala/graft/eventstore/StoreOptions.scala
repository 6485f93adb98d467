package graft.eventstore

/** Retention / maintenance configuration of an [[EventStore]] — the
  * analogue of the reference's env-driven boot config
  * (src/main.rs:13-34, `HEMATITE_STREAMS_DIR`), which hard-coded
  * nothing but the streams dir; graft's richer lifecycle (manifest
  * generations, GC grace, auto-compaction) makes these real knobs.
  *
  * @param gcGraceMs        age a superseded/orphaned file must reach
  *                         before GC may remove it — protects in-flight
  *                         commits that wrote data but have not yet
  *                         linked their manifest (default 10 min)
  * @param keptGenerations  manifest versions kept per stream (head
  *                         included); files referenced by any kept
  *                         generation survive GC, so readers planned
  *                         against up to `keptGenerations-1` versions
  *                         ago still find every file they listed
  *                         (default 2: head + predecessor; min 1)
  * @param autoCompactAfter live-file count at which [[EventStore.ingestBatch]]
  *                         folds a stream back to one file (0 = off;
  *                         default 16 — each compaction amortizes over
  *                         that many commits)
  * @param ingestDriverMaxKeys largest batch (events) whose ingest
  *                         metadata pass may collect key hashes to the
  *                         driver (8 bytes/event — the API-sized fast
  *                         path). Bigger batches (bulk backfills) take
  *                         the distributed dedup path: committed-key
  *                         sidecars are read on executors and joined
  *                         against the batch, and the new sidecars are
  *                         written by executors too, so driver memory
  *                         stays O(#streams) regardless of batch size
  *                         (default 4M ≈ 32 MB driver ceiling)
  */
case class StoreOptions(
    gcGraceMs: Long = 10 * 60 * 1000L,
    keptGenerations: Int = 2,
    autoCompactAfter: Int = 16,
    ingestDriverMaxKeys: Long = 4_000_000L) {
  require(gcGraceMs >= 0, s"gcGraceMs must be >= 0, got $gcGraceMs")
  require(keptGenerations >= 1,
    s"keptGenerations must be >= 1, got $keptGenerations")
  require(autoCompactAfter >= 0,
    s"autoCompactAfter must be >= 0 (0 = off), got $autoCompactAfter")
  require(ingestDriverMaxKeys >= 0,
    s"ingestDriverMaxKeys must be >= 0, got $ingestDriverMaxKeys")
}

object StoreOptions {
  /** Boot from environment, reference-style (main.rs:13-34):
    * GRAFT_GC_GRACE_MS / GRAFT_KEPT_GENERATIONS /
    * GRAFT_AUTO_COMPACT_AFTER, defaults where unset. The streams dir
    * itself (GRAFT_STREAMS_DIR) is read by [[EventStore.fromEnv]]. */
  def fromEnv(env: Map[String, String] = sys.env): StoreOptions =
    StoreOptions(
      gcGraceMs = env.get("GRAFT_GC_GRACE_MS").flatMap(_.toLongOption)
        .getOrElse(StoreOptions().gcGraceMs),
      keptGenerations = env.get("GRAFT_KEPT_GENERATIONS")
        .flatMap(_.toIntOption).getOrElse(StoreOptions().keptGenerations),
      autoCompactAfter = env.get("GRAFT_AUTO_COMPACT_AFTER")
        .flatMap(_.toIntOption).getOrElse(StoreOptions().autoCompactAfter),
      ingestDriverMaxKeys = env.get("GRAFT_INGEST_DRIVER_MAX_KEYS")
        .flatMap(_.toLongOption)
        .getOrElse(StoreOptions().ingestDriverMaxKeys))
}
