package graft.queries

import graft.multimodal.MediaOps
import org.apache.spark.sql.functions._

/** Driver-checkable form of the multimodal pipeline (VERDICT r1 item 9:
  * multimodal was the only spec-only component).
  *
  * The fixture is the seeded in-engine media table (payload bytes are a
  * pure function of `media_id`), decode is the declared deterministic
  * [[graft.multimodal.MediaOps.StubCodec]], and every feature is computed
  * per-row — so the output is bit-reproducible and pinned as a committed
  * golden parquet ([[Golden]]). The `sfDir` parameter is unused: media
  * bytes don't scale with SF (the real corpus would be a `binary` column
  * in parquet, read the same way at any scale).
  */
object MediaQueries {

  def queries: Seq[QueryDef] = Seq(mediaFeatures)

  /** Fixture rows (images/audio/video interleaved by id % 3). */
  val N = 120

  private val mediaFeatures = QueryDef(
    "media_features",
    (s, _) => {
      val media = MediaOps.fixture(s, N)
      MediaOps.unitFeatures(media)
        .select(col("media_id"), col("kind"), col("unit_idx"),
          round(col("px_mean").cast("double"), 6).as("px_mean"),
          round(col("px_std").cast("double"), 6).as("px_std"),
          round(col("edge_energy").cast("double"), 6).as("edge_energy"))
        .orderBy("media_id", "unit_idx")
    },
    Some(Golden.sql("media_features")))
}
