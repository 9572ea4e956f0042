package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalable text-deduplication primitives for a training-data pipeline.
  *
  * All hashing is md5-prefix-based (`conv(substr(md5(x),1,15),16,10)`,
  * a 60-bit positive integer) — deterministic and engine-portable (the
  * DuckDB oracle computes the identical value). The hot kernels
  * (minhash / simhash / shingling) are native single-pass Catalyst
  * expressions (direct byte-level hashing, CodegenFallback — the MD5
  * work dominates, so a codegen shim would buy one virtual call per
  * row); everything around them is built-in codegen'd functions. No
  * UDFs, no serialization breaks.
  *
  * Scale notes (100 TB): every op here is a narrow map over documents
  * followed by ONE shuffle keyed on something small (band hash /
  * fingerprint / shingle), never on document text. Candidate
  * generation via LSH banding keeps the pair space near-linear; the
  * exact-Jaccard verify join touches only candidate pairs.
  */
object TextDedupOps {

  /** Whitespace tokens of a trimmed text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Distinct k-token shingles (word n-grams), first-occurrence order;
    * empty array when the document has fewer than k tokens. Native
    * single-pass expression: the HOF formulation
    * (transform+element_at+concat_ws) re-evaluates the token child per
    * element inside the lambda — O(tokens) regex splits per row.
    */
  def shingles(text: Column, k: Int = 3): Column =
    graft.functions.VectorFunctions.shingle_array(tokens(text), k)

  /** 60-bit integer hash of a string column (md5-prefix), optionally
    * seeded — identical in DuckDB as
    * `CAST(('0x'||substr(md5(seed||'|'||x),1,15)) AS BIGINT)`.
    */
  def hash60(c: Column, seed: Option[Int] = None): Column = {
    val keyed = seed.fold(c)(s => concat(lit(s.toString), lit("|"), c))
    conv(substring(md5(keyed), 1, 15), 16, 10).cast("long")
  }

  /** MinHash signature: for each seed 0..k-1, the minimum hash60 over
    * the shingle set. Native single-pass expression (one md5 per
    * (seed, shingle), no per-element hex/string round-trips) — no
    * shuffle, no explode.
    */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    graft.functions.VectorFunctions.minhash_signature(shingleArr, numHashes)

  /** LSH band keys: split the signature into `bands` bands of
    * `rowsPerBand` and hash each band. Documents sharing any band key
    * are near-dup candidates.
    */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat_ws(",",
        transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))))

  /** Exact Jaccard similarity between two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni > 0, inter / uni).otherwise(lit(0.0))
  }

  /** SimHash fingerprint (60-bit to stay in signed-long range on every
    * engine): per bit, majority vote of token-hash bits. Computed as a
    * pure array expression — no shuffle.
    */
  def simhash(text: Column, bits: Int = 60): Column =
    graft.functions.VectorFunctions.simhash_fingerprint(tokens(text), bits)

  /** Full MinHash-LSH near-duplicate pair pipeline:
    * documents(idCol, textCol) → candidate pairs with exact Jaccard.
    *
    * Plan shape: map (shingles+signature+bands) → explode bands →
    * shuffle on band key (small) → self-join within buckets →
    * distinct pairs → one join back to fetch shingle sets → jaccard
    * filter. The only all-to-all exchange is keyed by band hash.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 2, minJaccard: Double = 0.0)
      : DataFrame = {
    // pre-partition on the join key: both sides of the self-join then
    // share one exchange (ReusedExchange) → shingling+minhash runs once
    val bd = banded(docs, idCol, textCol, numHashes, bands)
      .repartition(col("band"), col("bhash"))
    val a = bd.select(col("band"), col("bhash"),
      col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = bd.select(col("band"), col("bhash"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bhash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Incremental near-dup refresh — the pairs a snapshot DELTA adds,
    * without re-running pair generation over the corpus. `corpus` is
    * the current snapshot; `changedIds` (one id column named like
    * `idCol`) marks its added/updated documents (tx23's hash-compare
    * delta). Result = every candidate pair TOUCHING a changed doc,
    * with exact Jaccard — identical to [[minhashLshPairs]] over the
    * full corpus restricted to pairs involving the delta.
    *
    * Plan shape: the corpus is banded ONCE and serves as the standing
    * index (one side of ONE (band, bhash)-keyed equi-join — in a
    * production pipeline this side is the STORED index, not a
    * recompute); only the delta probes it (a broadcast semi-join marks
    * the probe rows — ids only, delta-sized). The unchanged partition
    * of the corpus is never self-joined: full-refresh work is
    * O(corpus²/buckets) per run, this is O(delta × bucket). A
    * changed×changed pair meets twice (each side probes the other) and
    * collapses in the canonical-order group-by; changed×unchanged
    * meets once.
    */
  def incrementalLshPairs(corpus: DataFrame, changedIds: DataFrame,
      idCol: String, textCol: String, numHashes: Int = 8, bands: Int = 2,
      minJaccard: Double = 0.0): DataFrame = {
    val bd = banded(corpus, idCol, textCol, numHashes, bands)
    val probe = bd
      .join(broadcast(changedIds.select(col(idCol).as("doc_id"))),
        Seq("doc_id"), "left_semi")
      .select(col("band"), col("bhash"), col("doc_id").as("id_a"),
        col("sh").as("sh_a"))
    val index = bd.select(col("band"), col("bhash"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    probe.join(index, Seq("band", "bhash"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .select(col("lo").as("id_a"), col("hi").as("id_b"), col("jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** The banded LSH projection of a document set: (doc_id, sh, band,
    * bhash) — the rows [[minhashLshPairs]] and [[incrementalLshPairs]]
    * band on the fly, and the rows [[writeLshIndex]] stores.
    */
  private def banded(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), shingles(col(textCol)).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), col("sh"),
        posexplode(bandHashes(minhashSignature(col("sh"), numHashes),
          bands, numHashes / bands)).as(Seq("band", "bhash")))

  /** Materialize the standing LSH index for `corpus` as a BUCKETED
    * table — the storage half of the incremental-dedup story
    * ([[incrementalLshPairs]] re-bands the corpus each run; a
    * production refresh bands it once per snapshot and probes the
    * stored rows). Layout: (band, bhash, doc_id, sh) bucketed AND
    * sorted by the probe key (band, bhash), so a probe join reads the
    * index bucket-aligned — the corpus-scale side of every subsequent
    * delta refresh moves ZERO bytes through a shuffle (the bucketed
    * scan's output partitioning already satisfies the join; only the
    * delta-scale probe side exchanges). Bucket count is the knob to
    * grow with the corpus (reducer-sized buckets, same sizing rule as
    * shuffle partitions).
    */
  def writeLshIndex(corpus: DataFrame, idCol: String, textCol: String,
      table: String, numHashes: Int = 8, bands: Int = 2,
      buckets: Int = 8, location: Option[String] = None): Unit = {
    // in-memory catalogs don't survive the JVM but managed-table
    // LOCATIONS do: drop any stale registration, and prefer an
    // explicit (external) location so a fresh build can never trip
    // over a dead JVM's warehouse directory
    corpus.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
    val w = banded(corpus, idCol, textCol, numHashes, bands)
      .write.bucketBy(buckets, "band", "bhash").sortBy("band", "bhash")
      .mode("overwrite")
    location.fold(w)(l => w.option("path", l)).saveAsTable(table)
  }

  /** The index-row projection of a delta document set — exactly the
    * rows [[writeLshIndex]] stores, exposed so changelog maintenance
    * ([[BucketedStores.applyDeltaAtomic]]) can compute an upsert's
    * replacement rows without reaching into the banding internals.
    */
  def lshIndexRows(docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 2): DataFrame =
    banded(docs, idCol, textCol, numHashes, bands)

  /** Index MAINTENANCE: band a delta and append its rows to the stored
    * index, so the NEXT delta's probe sees them — the between-snapshots
    * refresh that keeps [[probeLshIndex]] current without ever
    * re-banding the corpus. Appended files land in the same
    * (band, bhash) bucket layout (Spark bucketed-append adds files per
    * bucket; the probe join stays bucket-aligned). Delta-scale work
    * only.
    */
  def appendToLshIndex(spark: SparkSession, table: String,
      deltaDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 2, buckets: Int = 8): Unit =
    banded(deltaDocs, idCol, textCol, numHashes, bands)
      .write.bucketBy(buckets, "band", "bhash").sortBy("band", "bhash")
      .mode("append").saveAsTable(table)

  /** Probe a STORED index ([[writeLshIndex]]) with a snapshot delta
    * (id + text columns): the pairs a delta adds, identical to
    * [[incrementalLshPairs]] over the same corpus — but the corpus
    * text is never read and never re-banded. Per-refresh work: shingle
    * + band the DELTA (delta-scale map), one (band, bhash) equi-join
    * against the bucket-aligned index scan, candidate-only Jaccard.
    * A changed×changed pair meets twice (both sides are in the index);
    * the canonical-order group-by collapses it — same discipline as
    * [[incrementalLshPairs]].
    */
  def probeLshIndex(spark: SparkSession, table: String,
      deltaDocs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 8, bands: Int = 2,
      minJaccard: Double = 0.0): DataFrame = {
    val probe = banded(deltaDocs, idCol, textCol, numHashes, bands)
      .select(col("band"), col("bhash"), col("doc_id").as("id_a"),
        col("sh").as("sh_a"))
    val index = spark.table(table).select(col("band"), col("bhash"),
      col("doc_id").as("id_b"), col("sh").as("sh_b"))
    probe.join(index, Seq("band", "bhash"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("lo"),
        greatest(col("id_a"), col("id_b")).as("hi"),
        round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .select(col("lo").as("id_a"), col("hi").as("id_b"), col("jaccard"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
