package graft

/** DuckDB-SQL replay of Spark's `xxhash64` (XXH64, seed 42) and the two
  * xxhash64-flavored dedup oracles built on it.
  *
  * Spark's `xxhash64` is the standard 64-bit xxHash of the UTF-8 bytes
  * (XXH64Suite pins it to the reference test vectors), so it is
  * replayable in any engine with 128-bit integer arithmetic.  DuckDB has
  * no wrapping 64-bit ops, so the generated SQL works in HUGEINT on the
  * unsigned range [0, 2^64): wrapping multiply via 32-bit split (each
  * partial product < 2^65, inside HUGEINT), rotl as mod/div by powers of
  * two, xor through UBIGINT casts, and the byte/word loops as
  * `list_reduce` folds seeded with `list_prepend` (prepend supplies the
  * initial accumulator and makes the empty-tail case total).
  *
  * Each algorithm stage is its own CTE: state flows between stages as a
  * COLUMN NAME, never as a nested expression — the merge/fmix steps
  * reference their input ~6 times each, so textual nesting would blow up
  * ~6^k; staging keeps the whole chain a few KB.
  *
  * Validated against `xxhash64` over empty/short/32B-boundary/multi-
  * stripe/unicode strings and both dedup pipelines end-to-end at
  * sf0.001 and sf0.01 (tools/xxh64_sql_proto.py is the python twin this
  * was ported from).
  */
object OracleXxh64 {
  private val M = BigInt(1) << 64
  private val P1 = BigInt("11400714785074694791")
  private val P2 = BigInt("14029467366897019727")
  private val P3 = BigInt("1609587929392839161")
  private val P4 = BigInt("9650029242287828579")
  private val P5 = BigInt("2870177450012600261")
  private val Seed = BigInt(42)
  private val SignBit = BigInt(1) << 63

  private def mul(a: String, b: String): String =
    s"((($a) % 4294967296) * (($b) % 4294967296) + " +
      s"(((($a) % 4294967296) * (($b) // 4294967296) + " +
      s"(($a) // 4294967296) * (($b) % 4294967296)) % 4294967296) " +
      s"* 4294967296) % 18446744073709551616"

  private def add(a: String, b: String): String =
    s"((($a) + ($b)) % 18446744073709551616)"

  private def rotl(x: String, r: Int): String = {
    val lo = BigInt(1) << (64 - r)
    s"((($x) % $lo) * ${BigInt(1) << r} + ($x) // $lo)"
  }

  private def xor(a: String, b: String): String =
    s"CAST(xor(CAST(($a) AS UBIGINT), CAST(($b) AS UBIGINT)) AS HUGEINT)"

  private def shr(x: String, n: Int): String = s"(($x) // ${BigInt(1) << n})"

  private def fold(init: String, lst: String, body: String): String =
    s"list_reduce(list_prepend(CAST($init AS HUGEINT), $lst), (a, x) -> $body)"

  /** CTE chain (to splice after `WITH `) computing `out` = Spark
    * xxhash64(`sCol`) as a signed BIGINT for every row of `inCte`,
    * carrying `keyCols` through.  Final CTE: `xx_out(keyCols*, s, out)`.
    */
  def xxh64Cte(inCte: String, keyCols: Seq[String], sCol: String = "s",
      out: String = "h"): String = {
    val keys = keyCols.mkString(", ") + (if (keyCols.nonEmpty) ", " else "")
    val lane = mul(rotl(add("a", mul("x", P2.toString)), 31), P1.toString)
    val word8 = (0 until 8)
      .map(k => s"b[j*8+${k + 1}] * ${BigInt(1) << (8 * k)}").mkString(" + ")
    val u32 = (0 until 4)
      .map(k => s"b[(n // 8) * 8 + ${k + 1}] * ${BigInt(1) << (8 * k)}")
      .mkString(" + ")
    def laneFold(init: BigInt, laneIdx: Int): String =
      fold((init.mod(M)).toString,
        s"list_transform(range(0, n // 32), j -> w[4*j+$laneIdx])", lane)
    val mrg = add(add(add(rotl("v1", 1), rotl("v2", 7)), rotl("v3", 12)),
      rotl("v4", 18))
    def mergeRound(h: String, v: String): String =
      add(mul(xor(h, mul(rotl(mul(v, P2.toString), 31), P1.toString)),
        P1.toString), P4.toString)
    val wstep = add(mul(rotl(xor("a",
      mul(rotl(mul("x", P2.toString), 31), P1.toString)), 27), P1.toString),
      P4.toString)
    val bstep = mul(rotl(xor("a", mul("x", P5.toString)), 11), P1.toString)
    val h4step = add(mul(rotl(xor("h1", mul(s"($u32)", P1.toString)), 23),
      P2.toString), P3.toString)
    val fin = xor("f2", shr("f2", 32))
    s"""xx_b AS (
       |  SELECT $keys$sCol AS s,
       |         list_transform(regexp_extract_all(hex(encode($sCol)), '..'),
       |           p -> CAST(CAST(('0x' || p) AS BIGINT) AS HUGEINT)) AS b
       |  FROM $inCte
       |), xx_n AS (
       |  SELECT *, len(b) AS n,
       |         list_transform(range(0, len(b) // 8), j -> $word8) AS w
       |  FROM xx_b
       |), xx_v AS (
       |  SELECT *,
       |    CASE WHEN n >= 32 THEN ${laneFold(Seed + P1 + P2, 1)} END AS v1,
       |    CASE WHEN n >= 32 THEN ${laneFold(Seed + P2, 2)} END AS v2,
       |    CASE WHEN n >= 32 THEN ${laneFold(Seed, 3)} END AS v3,
       |    CASE WHEN n >= 32 THEN ${laneFold(Seed - P1, 4)} END AS v4
       |  FROM xx_n
       |), xx_m0 AS (
       |  SELECT *, CASE WHEN n >= 32 THEN $mrg END AS mh FROM xx_v
       |), xx_m1 AS (
       |  SELECT *, CASE WHEN n >= 32 THEN ${mergeRound("mh", "v1")} END AS mh1 FROM xx_m0
       |), xx_m2 AS (
       |  SELECT *, CASE WHEN n >= 32 THEN ${mergeRound("mh1", "v2")} END AS mh2 FROM xx_m1
       |), xx_m3 AS (
       |  SELECT *, CASE WHEN n >= 32 THEN ${mergeRound("mh2", "v3")} END AS mh3 FROM xx_m2
       |), xx_m4 AS (
       |  SELECT *, CASE WHEN n >= 32 THEN ${mergeRound("mh3", "v4")} END AS mh4 FROM xx_m3
       |), xx_h0 AS (
       |  SELECT *, ((CASE WHEN n >= 32 THEN mh4 ELSE ${(Seed + P5).mod(M)} END) + n)
       |            % 18446744073709551616 AS h0
       |  FROM xx_m4
       |), xx_h1 AS (
       |  SELECT *, ${fold("h0", "w[(n // 32) * 4 + 1 : n // 8]", wstep)} AS h1 FROM xx_h0
       |), xx_h2 AS (
       |  SELECT *, CASE WHEN n % 8 >= 4 THEN $h4step ELSE h1 END AS h2 FROM xx_h1
       |), xx_h3 AS (
       |  SELECT *, ${fold("h2",
          "b[(n // 8) * 8 + (CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END) + 1 : n]",
          bstep)} AS h3
       |  FROM xx_h2
       |), xx_f1 AS (
       |  SELECT *, ${mul(xor("h3", shr("h3", 33)), P2.toString)} AS f1 FROM xx_h3
       |), xx_f2 AS (
       |  SELECT *, ${mul(xor("f1", shr("f1", 29)), P3.toString)} AS f2 FROM xx_f1
       |), xx_out AS (
       |  SELECT ${keys}s,
       |         CAST($fin - CASE
       |           WHEN $fin >= $SignBit
       |           THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS $out
       |  FROM xx_f2
       |)""".stripMargin
  }

  private val P = 2147483647L // DedupOps.P (2^31-1)

  /** `q_dedup_minhash` (xxhash64 flavor) end-to-end in DuckDB: the same
    * 3-shingles as the md5 oracle, base hashes = pmod(xxhash64(s), P)
    * via [[xxh64Cte]] over the DISTINCT shingle vocabulary (hash once
    * per string, join back to occurrences), the 32 LCG signature minima
    * as plain row-grouped `min`s, band keys as the comma-joined
    * signature slice — Spark hashes the slice with xxhash64, but the
    * join is an equality on it, and slice equality ⟺ key equality up to
    * a 2^-64 collision — then the band self-join and the exact-Jaccard
    * verify, identical to the portable oracle.
    */
  def minhashOracleSql(numHashes: Int, bands: Int, threshold: Double): String =
    s"""WITH ${minhashPairsCtes(numHashes, bands, threshold)}
       |SELECT id_a, id_b, jaccard FROM mh_pairs
       |ORDER BY id_a, id_b""".stripMargin

  /** The same pipeline as a reusable CTE fragment (splice after
    * `WITH `): ends with `mh_pairs(id_a, id_b, jaccard)` — the
    * verified pairs at `threshold`.  Lets composite oracles (e.g. the
    * connected-components replay) consume the banded-minhash pair set
    * the Spark scale path produces.
    */
  def minhashPairsCtes(numHashes: Int, bands: Int, threshold: Double): String = {
    val rows = numHashes / bands
    val sig = graft.ops.DedupOps.hashParams(numHashes)
      .map { case (a, b) => s"min(($a * hm + $b) % $P)" }
      .mkString(",\n           ")
    s"""t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents
       |), shing AS (
       |  SELECT doc_id,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(toks) - 2, 1) + 1),
       |           i -> array_to_string(toks[i:i+2], ' '))) AS sh
       |  FROM t
       |), vocab AS (
       |  SELECT DISTINCT unnest(sh) AS s0 FROM shing
       |), ${xxh64Cte("vocab", Nil, sCol = "s0")}, hv AS (
       |  SELECT s, ((h % $P) + $P) % $P AS hm FROM xx_out
       |), sr AS (
       |  SELECT doc_id, unnest(sh) AS s FROM shing
       |), sigs AS (
       |  SELECT doc_id, [$sig] AS sig
       |  FROM sr JOIN hv USING (s) GROUP BY doc_id
       |), banded AS (
       |  SELECT doc_id, u.b,
       |         array_to_string(sig[u.b*$rows+1 : u.b*$rows+$rows], ',') AS band_key
       |  FROM sigs, (SELECT unnest(range($bands)) AS b) u
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
       |  FROM banded a JOIN banded c
       |    ON a.b = c.b AND a.band_key = c.band_key AND a.doc_id < c.doc_id
       |), mh_pairs AS (
       |  SELECT id_a, id_b, jaccard FROM (
       |    SELECT cand.id_a, cand.id_b,
       |           CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
       |             / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
       |    FROM cand JOIN shing x ON x.doc_id = cand.id_a
       |              JOIN shing y ON y.doc_id = cand.id_b) v
       |  WHERE jaccard >= $threshold
       |)""".stripMargin
  }

  /** `q_dedup_simhash` (xxhash64 flavor) in DuckDB: per-occurrence
    * 64-bit xxhash64 token hashes (hashed once per DISTINCT token, then
    * joined back), the 64 per-bit ±1 majority votes on the UNSIGNED
    * representation (bit b of the signed long == bit b of h+2^64), the
    * unsigned bit-sum converted back to the signed simhash only for the
    * output column, 4×16-bit chunk blocking with the hot-bucket cap,
    * and hamming = bit_count(xor) on the unsigned pair.
    */
  def simhashOracleSql(maxHamming: Int, maxBucket: Int): String = {
    val bitVotes = (0 until 64).map { b =>
      s"(CASE WHEN sum(CAST((hu // ${BigInt(1) << b}) % 2 AS BIGINT) * 2 - 1) > 0 " +
        s"THEN CAST(${BigInt(1) << b} AS HUGEINT) ELSE 0 END)"
    }.mkString("\n       + ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
       |  FROM documents
       |), occ AS (
       |  SELECT doc_id, unnest(toks) AS s FROM t WHERE len(toks) > 0
       |), vocab AS (
       |  SELECT DISTINCT s AS s0 FROM occ
       |), ${xxh64Cte("vocab", Nil, sCol = "s0")}, hv AS (
       |  SELECT s, CAST(h AS HUGEINT) + CASE WHEN h < 0
       |            THEN 18446744073709551616 ELSE 0 END AS hu
       |  FROM xx_out
       |), sh AS (
       |  SELECT doc_id,
       |       $bitVotes AS su
       |  FROM occ JOIN hv USING (s) GROUP BY doc_id
       |), chunked AS (
       |  SELECT doc_id, su, u.c,
       |         CAST((su // (1 << (u.c * 16))) % 65536 AS BIGINT) AS chunk_val
       |  FROM sh, (SELECT unnest(range(4)) AS c) u
       |), cold AS (
       |  SELECT ch.* FROM chunked ch
       |  JOIN (SELECT c, chunk_val FROM chunked GROUP BY c, chunk_val
       |        HAVING count(*) <= $maxBucket) ok
       |    ON ch.c = ok.c AND ch.chunk_val = ok.chunk_val
       |)
       |SELECT id_a, id_b, hamming FROM (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |         CAST(bit_count(xor(CAST(a.su AS UBIGINT), CAST(b.su AS UBIGINT)))
       |              AS BIGINT) AS hamming
       |  FROM cold a JOIN cold b
       |    ON a.c = b.c AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id) p
       |WHERE hamming <= $maxHamming
       |ORDER BY id_a, id_b""".stripMargin
  }
}
