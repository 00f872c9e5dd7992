package graft.core

/** DuckDB SQL replay of the engine's 64-bit hash family: Spark's XXH64
  * (xxHash64, seed 0 — `org.apache.spark.sql.catalyst.expressions.XXH64`,
  * the base hash of [[graft.functions.TextKernels.minhashBands]]) and the
  * murmur3 64-bit finalizer ([[graft.functions.Mix.fmix64]], the hash-family
  * derivation mix). Single-sourced with the kernels like [[TokenHash]]:
  * the generated SQL and the Scala kernel live in one repo so a change to
  * either side cannot leave the oracle silently checking a different hash.
  *
  * This is what turns the MinHash-LSH family from `no_oracle` into an
  * exactly-checkable query: the banded signature is deterministic given the
  * hash, and DuckDB can replay the hash bit-for-bit. All 64-bit wrap
  * arithmetic runs as HUGEINT (int128) modulo 2^64 — products of 32-bit
  * limbs never overflow, sums stay under 2^65 — then narrows back to
  * UBIGINT; xor/shift/compare stay in UBIGINT.
  *
  * Validated against the kernel over random multi-byte UTF-8 strings of
  * every length class (empty tail, 4-byte tail, byte tail, 1..N stripes)
  * and end-to-end by the `dedup_minhash_lsh` / `stream_neardup_join`
  * oracle gates.
  */
object XxHashSql {

  private val M = "18446744073709551616::HUGEINT" // 2^64
  // xxHash64 primes
  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)
  // murmur3 fmix64 multipliers (Mix.fmix64)
  private val F1 = java.lang.Long.parseUnsignedLong("FF51AFD7ED558CCD", 16)
  private val F2 = java.lang.Long.parseUnsignedLong("C4CEB9FE1A85EC53", 16)

  private def u(c: Long): String = s"${java.lang.Long.toUnsignedString(c)}::UBIGINT"

  private def add64(a: String, b: String): String =
    s"CAST((CAST($a AS HUGEINT) + CAST($b AS HUGEINT)) % $M AS UBIGINT)"

  /** (a * b) mod 2^64 via 32-bit limbs: lo*lo + ((lo*hi + hi*lo) mod 2^32
    * << 32); every intermediate fits int128. */
  private def mul64(a: String, b: String): String = {
    val al = s"($a & 4294967295::UBIGINT)"; val ah = s"($a >> 32)"
    val bl = s"($b & 4294967295::UBIGINT)"; val bh = s"($b >> 32)"
    val cross = s"((CAST($al * $bh AS HUGEINT) + CAST($ah * $bl AS HUGEINT)) % 4294967296::HUGEINT)"
    s"CAST((CAST($al * $bl AS HUGEINT) + ($cross << 32)) % $M AS UBIGINT)"
  }
  private def mulc(a: String, c: Long): String = mul64(a, u(c))

  private def rotl(x: String, r: Int): String =
    s"(CAST((CAST($x AS HUGEINT) << $r) % $M AS UBIGINT) | ($x >> ${64 - r}))"

  private def xor(a: String, b: String): String = s"xor($a, $b)"

  /** xxh64 round: rotl64(acc + x*P2, 31) * P1. */
  private def rnd(acc: String, x: String): String =
    mulc(rotl(add64(acc, mulc(x, P2)), 31), P1)
  private def rnd0(x: String): String = mulc(rotl(mulc(x, P2), 31), P1)

  /** 8-byte little-endian word of hex column `hx` at byte offset expr. */
  private def word8(hx: String, off: String): String = {
    val parts = (7 to 0 by -1)
      .map(i => s"substr($hx, 2*($off) + ${2 * i + 1}, 2)").mkString(", ")
    s"CAST(concat('0x', $parts) AS UBIGINT)"
  }
  private def word4(hx: String, off: String): String = {
    val parts = (3 to 0 by -1)
      .map(i => s"substr($hx, 2*($off) + ${2 * i + 1}, 2)").mkString(", ")
    s"CAST(concat('0x', $parts) AS UBIGINT)"
  }
  private def byte1(hx: String, off: String): String =
    s"CAST(concat('0x', substr($hx, 2*($off) + 1, 2)) AS UBIGINT)"

  /** Murmur fmix64 staged across 5 CTEs on column `h` (carrying `keep`). */
  def fmixCtes(pfx: String, inp: String, out: String, keep: Seq[String]): String = {
    val k = keep.mkString(", ")
    s"""${pfx}a AS (SELECT $k, ${xor("h", "h >> 33")} AS h FROM $inp),
       |${pfx}b AS (SELECT $k, ${mulc("h", F1)} AS h FROM ${pfx}a),
       |${pfx}c AS (SELECT $k, ${xor("h", "h >> 33")} AS h FROM ${pfx}b),
       |${pfx}d AS (SELECT $k, ${mulc("h", F2)} AS h FROM ${pfx}c),
       |$out AS (SELECT $k, ${xor("h", "h >> 33")} AS h FROM ${pfx}d)""".stripMargin
  }

  /** Derive the j = 0..k-1 hash family fmix64(h64 xor j·GOLDEN)
    * ([[graft.functions.HashFamily]]) for every row of
    * `$inp(keep..., h64)`: emits `$out(keep..., j, h)`. This is the
    * Kirsch–Mitzenmacher-style construction — k probes derived from ONE
    * string hash — so each extra probe costs two wrap-multiplies
    * instead of a full per-byte XXH64 replay. */
  def familyCtes(pfx: String, inp: String, out: String, k: Int,
      keep: Seq[String]): String = {
    val golden = java.lang.Long.parseUnsignedLong("9E3779B97F4A7C15", 16)
    val jg = s"CAST((CAST(j AS HUGEINT) * ${java.lang.Long.toUnsignedString(golden)}::HUGEINT) % $M AS UBIGINT)"
    val ks = keep.mkString(", ")
    s"""${pfx}j AS (SELECT $ks, j, ${xor("h64", jg)} AS h
       |  FROM $inp CROSS JOIN (SELECT unnest(range($k)) AS j)),
       |${fmixCtes(pfx, pfx + "j", out, keep :+ "j")}""".stripMargin
  }

  /** Murmur fmix64 as one inline expression of `v` (for lambda bodies,
    * where `v` is a cheap variable reference — inlining a complex
    * expression here would blow the SQL up ~70x). */
  def fmixInline(v: String): String = {
    val x1 = s"xor($v, ($v) >> 33)"
    val m1 = mulc(x1, F1)
    val x2 = s"xor($m1, ($m1) >> 33)"
    val m2 = mulc(x2, F2)
    s"xor($m2, ($m2) >> 33)"
  }

  /** CTE chain replaying XXH64(utf8-bytes, seed 0) for every row of
    * `$tokCte(doc_id, t)`: emits `$outCte(doc_id, t, h64 UBIGINT)`.
    *
    * Layout per row: hex-encode the UTF-8 bytes once, then (a) fold the
    * 32-byte stripes with a {v1..v4} struct accumulator (list_reduce over
    * struct-typed stripe words — acc and elements must share one type),
    * (b) stage the four merge rounds across CTEs (textual nesting grows
    * 3^4x otherwise), (c) fold the remaining 8-byte words, (d) one 4-byte
    * word, (e) up to three tail bytes as CASE-guarded stages, (f) the
    * xxh64 avalanche (33/P2/29/P3/32 — NOT the murmur fmix). */
  def hash64Ctes(tokCte: String, outCte: String, pfx: String = "xx"): String = {
    val c = pfx
    val V1 = u(P1 + P2); val V2 = u(P2); val V3 = u(0L); val V4 = u(-P1)
    val stripeElem = "{" + (0 until 4)
      .map(l => s"'v${l + 1}': ${word8("hx", s"32*i + ${8 * l}")}").mkString(", ") + "}"
    val stripeLambda = "{" + (0 until 4)
      .map(l => s"'v${l + 1}': ${rnd(s"acc.v${l + 1}", s"x.v${l + 1}")}").mkString(", ") + "}"
    val stripesInit = s"{'v1': $V1, 'v2': $V2, 'v3': $V3, 'v4': $V4}"
    val hmerged = add64(add64(add64(rotl("sv.v1", 1), rotl("sv.v2", 7)),
      rotl("sv.v3", 12)), rotl("sv.v4", 18))
    def mergeStep(h: String, v: String): String =
      add64(mulc(xor(h, rnd0(v)), P1), u(P4))
    val tailLambda = add64(mulc(rotl(xor("acc", rnd0("x")), 27), P1), u(P4))
    val h4 = add64(mulc(rotl(xor("h", mulc(word4("hx", "q0"), P1)), 23), P2), u(P3))
    def hb(off: String): String =
      mulc(rotl(xor("h", mulc(byte1("hx", off), P5)), 11), P1)

    s"""${c}0 AS (SELECT doc_id, t, hex(encode(t)) AS hx, octet_length(encode(t)) AS nb FROM $tokCte),
       |${c}2 AS (SELECT doc_id, t, hx, nb,
       |    CASE WHEN nb >= 32 THEN list_reduce(list_prepend($stripesInit,
       |      list_transform(range(nb // 32), i -> $stripeElem)), (acc, x) -> $stripeLambda) END AS sv
       |    FROM ${c}0),
       |${c}3a AS (SELECT doc_id, t, hx, nb, sv, CASE WHEN sv IS NULL THEN ${u(P5)} ELSE $hmerged END AS h0 FROM ${c}2),
       |${c}3b AS (SELECT doc_id, t, hx, nb, sv, CASE WHEN sv IS NULL THEN h0 ELSE ${mergeStep("h0", "sv.v1")} END AS h0 FROM ${c}3a),
       |${c}3c AS (SELECT doc_id, t, hx, nb, sv, CASE WHEN sv IS NULL THEN h0 ELSE ${mergeStep("h0", "sv.v2")} END AS h0 FROM ${c}3b),
       |${c}3d AS (SELECT doc_id, t, hx, nb, sv, CASE WHEN sv IS NULL THEN h0 ELSE ${mergeStep("h0", "sv.v3")} END AS h0 FROM ${c}3c),
       |${c}3 AS (SELECT doc_id, t, hx, nb, CASE WHEN sv IS NULL THEN h0 ELSE ${mergeStep("h0", "sv.v4")} END AS h0 FROM ${c}3d),
       |${c}4 AS (SELECT doc_id, t, hx, nb, 32*(nb // 32) AS p0, ${add64("h0", "nb::UBIGINT")} AS h FROM ${c}3),
       |${c}5 AS (SELECT doc_id, t, hx, nb, 8*(nb // 8) AS q0,
       |    CASE WHEN (nb // 8) - (p0 // 8) > 0 THEN list_reduce(list_prepend(h,
       |      list_transform(range((nb // 8) - (p0 // 8)), i -> ${word8("hx", "p0 + 8*i")})), (acc, x) -> $tailLambda) ELSE h END AS h
       |    FROM ${c}4),
       |${c}6 AS (SELECT doc_id, t, hx, nb, CASE WHEN nb - q0 >= 4 THEN q0 + 4 ELSE q0 END AS p,
       |    CASE WHEN nb - q0 >= 4 THEN $h4 ELSE h END AS h
       |    FROM ${c}5),
       |${c}7a AS (SELECT doc_id, t, hx, nb, p, CASE WHEN nb - p >= 1 THEN ${hb("p")} ELSE h END AS h FROM ${c}6),
       |${c}7b AS (SELECT doc_id, t, hx, nb, p, CASE WHEN nb - p >= 2 THEN ${hb("p + 1")} ELSE h END AS h FROM ${c}7a),
       |${c}7c AS (SELECT doc_id, t, CASE WHEN nb - p >= 3 THEN ${hb("p + 2")} ELSE h END AS h FROM ${c}7b),
       |${c}8a AS (SELECT doc_id, t, ${xor("h", "h >> 33")} AS h FROM ${c}7c),
       |${c}8b AS (SELECT doc_id, t, ${mulc("h", P2)} AS h FROM ${c}8a),
       |${c}8c AS (SELECT doc_id, t, ${xor("h", "h >> 29")} AS h FROM ${c}8b),
       |${c}8d AS (SELECT doc_id, t, ${mulc("h", P3)} AS h FROM ${c}8c),
       |$outCte AS (SELECT doc_id, t, ${xor("h", "h >> 32")} AS h64 FROM ${c}8d)""".stripMargin
  }

  /** CTE chain replaying the banded MinHash signature
    * ([[graft.functions.TextKernels.minhashBands]]) over the distinct
    * `shingleK`-gram shingles of `documents`: tokenize with `re` (the
    * shared Tokenizer parity regex), XXH64 each shingle, derive the
    * `numHashes` family as fmix64(base xor j*GOLDEN), take per-(doc, j)
    * minima, and fold each band of r = numHashes/bands minima with
    * fmix64(acc xor min) from the Scala-computed per-band seed
    * fmix64(b + P3). Emits `mbh(doc_id, b, bh)` — one banded hash per
    * (document, band); docs with < shingleK tokens have no rows (the
    * kernel returns an empty signature for them). */
  def minhashBandCtes(re: String, shingleK: Int, numHashes: Int,
      bands: Int): String =
    s"""${minhashShingleCtes(re, shingleK)},
       |${minhashMinCtes(numHashes)},
       |${minhashFoldCtes(numHashes, bands)}""".stripMargin

  /** The three [[minhashBandCtes]] segments, split so the gate prelude
    * ([[graft.OraclePrelude]]) can materialize each stage's output table
    * (g_msh / g_mmin / g_mbh) ONCE per run — dependent oracles then read
    * the tables instead of re-expanding the whole chain per query.
    * Segment boundaries are exactly the CTEs downstream oracles consume:
    * `msh` (distinct shingles), `mmin` (per-(doc, j) family minima),
    * `mbh` (banded hashes). */
  def minhashShingleCtes(re: String, shingleK: Int): String =
    s"""msh0 AS (
       |  SELECT doc_id, regexp_extract_all(text, '$re') AS ts FROM documents),
       |msh AS (
       |  SELECT doc_id, unnest(list_distinct(
       |    [array_to_string(list_slice(ts, i, i + ${shingleK - 1}), ' ')
       |     for i in range(1, len(ts) - $shingleK + 2)])) AS t
       |  FROM msh0 WHERE len(ts) >= $shingleK)""".stripMargin

  def minhashMinCtes(numHashes: Int): String = {
    val golden = java.lang.Long.parseUnsignedLong("9E3779B97F4A7C15", 16)
    val jk = s"CAST((CAST(j AS HUGEINT) * ${java.lang.Long.toUnsignedString(golden)}::HUGEINT) % $M AS UBIGINT)"
    s"""${hash64Ctes("msh", "mbase", "mxx")},
       |mhj AS (
       |  SELECT doc_id, ${xor("h64", jk)} AS h, j
       |  FROM mbase CROSS JOIN (SELECT unnest(range($numHashes)) AS j)),
       |${fmixCtes("mhf", "mhj", "mhf", Seq("doc_id", "j"))},
       |-- the kernel's min is over SIGNED longs; replaying it on UBIGINT
       |-- bits = unsigned min of (h xor 2^63), xored back (sign-bit flip
       |-- maps signed order onto unsigned order). A plain min(h) picks a
       |-- different element whenever a (doc, j) family spans the sign
       |-- bit — caught by the dedup_minhash_est component-agreement gate
       |mmin AS (SELECT doc_id, j,
       |  xor(min(xor(h, 9223372036854775808::UBIGINT)),
       |      9223372036854775808::UBIGINT) AS mh
       |  FROM mhf GROUP BY doc_id, j)""".stripMargin
  }

  def minhashFoldCtes(numHashes: Int, bands: Int): String = {
    require(bands >= 1 && bands <= numHashes && numHashes % bands == 0)
    val r = numHashes / bands
    // per-band fold seed, computed by the kernel's own mix — the VALUES
    // list is tiny (bands rows) and keeps the SQL free of another fmix
    // replay of a constant
    val bandInits = (0 until bands)
      .map(b => s"($b, ${java.lang.Long.toUnsignedString(
        graft.functions.Mix.fmix64(b + P3))}::UBIGINT)").mkString(", ")
    s"""mband AS (
       |  SELECT doc_id, CAST(j // $r AS INTEGER) AS b, list(mh ORDER BY j) AS ms
       |  FROM mmin GROUP BY doc_id, j // $r),
       |mbinit(b, acc0) AS (VALUES $bandInits),
       |mbh AS (
       |  SELECT doc_id, mband.b AS b,
       |    list_reduce(list_prepend(acc0, ms), (acc, x) -> ${fmixInline("xor(acc, x)")}) AS bh
       |  FROM mband JOIN mbinit ON mband.b = mbinit.b)""".stripMargin
  }

  /** CTE chain replaying the RP-LSH signature kernel
    * ([[graft.operators.Similarity.rpLshSigKernel]]): the Rademacher
    * hyperplane component for (table t, bit b, dim i) is the low bit of
    * fmix64(t*1048573 + b*8191 + i) — replayed with the staged fmix over
    * a tables x bits x dim range product — and each signature bit is the
    * sign of the left-to-right dot fold of the double-cast embedding
    * against that +-1 vector (float -> double casts are exact on both
    * engines, and both fold in ascending dimension order, so the FP sum
    * is bit-identical). Emits `sigs(vec_id, tbl INT, sig BIGINT)` over
    * `embeddings` — the exact rows `posexplode(rp_lsh_sig(...))`
    * produces. */
  def rpLshSigCtes(tables: Int, bits: Int, dim: Int): String =
    s"""hy0 AS (
       |  SELECT t, b, i, CAST(t*1048573 + b*8191 + i AS UBIGINT) AS h
       |  FROM range($tables) r1(t), range($bits) r2(b), range($dim) r3(i)),
       |${fmixCtes("hyf", "hy0", "hyf", Seq("t", "b", "i"))},
       |hyp AS (
       |  SELECT t, b, list(CASE WHEN (h & 1::UBIGINT) = 0::UBIGINT THEN 1.0 ELSE -1.0 END ORDER BY i) AS sl
       |  FROM hyf GROUP BY t, b),
       |ev AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |dots AS (
       |  SELECT ev.vec_id, hyp.t, hyp.b,
       |    list_reduce(list_prepend(0.0, list_transform(list_zip(ev.v, hyp.sl),
       |      p -> p[1] * p[2])), (acc, x) -> acc + x) AS dot
       |  FROM ev CROSS JOIN hyp),
       |sigs AS (
       |  SELECT vec_id, CAST(t AS INTEGER) AS tbl,
       |    -- UBIGINT shift (the simhash-pack discipline): a 32-bit
       |    -- `1 << b` overflows for b >= 31, capping the oracle at a
       |    -- narrower signature than the kernel's 63-bit bound
       |    CAST(sum(CASE WHEN dot >= 0
       |      THEN (1::UBIGINT << CAST(b AS INTEGER)) ELSE 0::UBIGINT END)
       |      AS BIGINT) AS sig
       |  FROM dots GROUP BY vec_id, t)""".stripMargin

  /** Full MinHash-LSH near-dup oracle: band-bucket candidates (optionally
    * capping runaway buckets like [[graft.operators.Dedup.lshCandidates]])
    * verified by exact shingle Jaccard >= `threshold`. Matches
    * [[graft.operators.Dedup.minhashNearDups]] (capped) and
    * [[graft.streaming.StreamingOps.streamingNearDups]] (uncapped)
    * bit-for-bit — the only approximation in either query is WHICH pairs
    * the bands surface, and the bands are replayed exactly. */
  def minhashPairsSql(re: String, shingleK: Int, numHashes: Int, bands: Int,
      threshold: Double, bucketCap: Option[Int]): String = {
    val capFilter = bucketCap.map(_ => "in_capped AND ").getOrElse("")
    s"""WITH ${minhashBandCtes(re, shingleK, numHashes, bands)},
       |${minhashVerifyCtes(CappedBucketLimit)}
       |SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
       |FROM mver WHERE ${capFilter}jaccard >= $threshold""".stripMargin
  }

  /** The hot-bucket cap the capped LSH kernels share
    * ([[graft.operators.Dedup.lshCandidates]]'s 1000) — ONE literal so
    * the verify chain below and every capped oracle agree. */
  val CappedBucketLimit: Int = 1000

  /** Candidate generation + exact-Jaccard verify over the band table —
    * the EXPENSIVE common stage of the three minhash oracles
    * (`dedup_minhash_lsh` capped, `stream_neardup_join` uncapped,
    * `dedup_minhash_est` capped + signature agreement), factored to ONE
    * text so the gate prelude materializes it once (`g_mver`). `mver`
    * carries every UNCAPPED candidate pair with its exact shingle
    * Jaccard plus `in_capped` = whether some ≤cap bucket surfaced the
    * pair: the capped candidate set is exactly the `in_capped` subset
    * (a pair survives the cap iff at least one of its colliding buckets
    * is small enough), so both variants project from the same table. */
  def minhashVerifyCtes(cap: Int): String =
    s"""mbuck AS (
       |  SELECT b, bh, count(*) AS nb, list(doc_id) AS ids FROM mbh
       |  GROUP BY b, bh HAVING count(*) > 1),
       |mcand AS (
       |  SELECT ia.a AS doc_a, ib.a AS doc_b, bool_or(nb <= $cap) AS in_capped
       |  FROM mbuck, unnest(ids) AS ia(a), unnest(ids) AS ib(a)
       |  WHERE ia.a < ib.a GROUP BY 1, 2),
       |mcnt AS (SELECT doc_id, count(*) AS n FROM msh GROUP BY doc_id),
       |mint AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS inter
       |  FROM mcand c
       |  JOIN msh a ON a.doc_id = c.doc_a
       |  JOIN msh b ON b.doc_id = c.doc_b AND a.t = b.t
       |  GROUP BY c.doc_a, c.doc_b),
       |mver AS (
       |  SELECT c.doc_a, c.doc_b, c.in_capped,
       |    coalesce(m.inter, 0) AS inter, ca.n AS n_a, cb.n AS n_b,
       |    coalesce(m.inter, 0) * 1.0
       |      / (ca.n + cb.n - coalesce(m.inter, 0)) AS jaccard
       |  FROM mcand c
       |  LEFT JOIN mint m ON m.doc_a = c.doc_a AND m.doc_b = c.doc_b
       |  JOIN mcnt ca ON ca.doc_id = c.doc_a
       |  JOIN mcnt cb ON cb.doc_id = c.doc_b)""".stripMargin

  /** Full SQL replaying [[graft.operators.Dedup.winnowingPairs]]: ordered
    * (duplicate-keeping) k-shingles, XXH64 each DISTINCT shingle string
    * once, reassemble per-doc ordered hash lists, take every w-window
    * minimum in the sign-bit-flipped domain (UBIGINT min there = the
    * kernel's SIGNED long min — the `mmin` discipline), distinct the
    * selected values, and run the same postings-cap pair join. Emits
    * (doc_a, doc_b, n_shared, n_a, n_b, score). */
  /** The winnow chain's shared prefix (token lists → duplicate-keeping
    * k-shingles → distinct shingle strings), exposed so the gate
    * prelude can materialize the XXH64 table over `wdis` once for both
    * winnow oracles. */
  def winnowShingleCtes(re: String, k: Int, w: Int): String =
    s"""wt AS (
       |  SELECT doc_id, regexp_extract_all(text, '$re') AS ts FROM documents),
       |wsh AS (
       |  SELECT doc_id,
       |    [array_to_string(list_slice(ts, i, i + ${k - 1}), ' ')
       |     for i in range(1, len(ts) - $k + 2)] AS ss
       |  FROM wt WHERE len(ts) >= ${k + w - 1}),
       |wdis AS (
       |  SELECT DISTINCT 0 AS doc_id, t
       |  FROM (SELECT unnest(ss) AS t FROM wsh))""".stripMargin

  def winnowingPairsSql(re: String, k: Int, w: Int, minShared: Int,
      dfCap: Int): String = {
    val flip = "9223372036854775808::UBIGINT"
    s"""WITH ${winnowShingleCtes(re, k, w)},
       |${hash64Ctes("wdis", "whash", "wxx")},
       |wpos AS (
       |  SELECT doc_id, unnest(ss) AS t,
       |    unnest(range(1, len(ss) + 1)) AS pos
       |  FROM wsh),
       |whl AS (
       |  SELECT p.doc_id, list(xor(h.h64, $flip) ORDER BY p.pos) AS hs
       |  FROM wpos p JOIN whash h ON p.t = h.t GROUP BY p.doc_id),
       |wfp AS (
       |  SELECT doc_id, list_distinct(
       |    [list_aggregate(list_slice(hs, j, j + ${w - 1}), 'min')
       |     for j in range(1, len(hs) - $w + 2)]) AS fps
       |  FROM whl),
       |wcnt AS (SELECT doc_id, len(fps) AS n FROM wfp),
       |wexp AS (SELECT doc_id, unnest(fps) AS fp FROM wfp),
       |wpost AS (
       |  SELECT fp, list(doc_id ORDER BY doc_id) AS ids FROM wexp
       |  GROUP BY fp HAVING count(*) BETWEEN 2 AND $dfCap),
       |wshared AS (
       |  SELECT ia.a AS doc_a, ib.a AS doc_b, count(*) AS n_shared
       |  FROM wpost, unnest(ids) AS ia(a), unnest(ids) AS ib(a)
       |  WHERE ia.a < ib.a GROUP BY ia.a, ib.a)
       |SELECT s.doc_a, s.doc_b, s.n_shared, ca.n AS n_a, cb.n AS n_b,
       |  round(CAST(s.n_shared AS DOUBLE) / least(ca.n, cb.n), 6) AS score
       |FROM wshared s
       |JOIN wcnt ca ON ca.doc_id = s.doc_a
       |JOIN wcnt cb ON cb.doc_id = s.doc_b
       |WHERE s.n_shared >= $minShared""".stripMargin
  }
}
