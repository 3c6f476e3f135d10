#!/usr/bin/env python3
"""Prototype the full q_dedup_minhash / q_dedup_simhash DuckDB oracles
(xxhash64 flavors) and compare with Spark's Verify dumps."""
import sys
import duckdb
import pandas as pd
from xxh64_sql_proto import xxh64_cte

P = 2147483647


def lcg_params(n):
    """DedupOps.hashParams replica: LCG with exact i64 wrap."""
    state = 42
    out = []

    def nxt():
        nonlocal state
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        # arithmetic >>> 33 on the unsigned repr == logical shift
        return (state >> 33) % (P - 1)
    for _ in range(n):
        a = nxt() + 1
        b = nxt()
        out.append((a, b))
    return out


def minhash_oracle(num_hashes=32, bands=8, threshold=0.5):
    rows = num_hashes // bands
    sig = ",\n           ".join(
        f"min(({a} * hm + {b}) % {P})" for a, b in lcg_params(num_hashes))
    return f"""WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), shing AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' '))) AS sh
  FROM t
), vocab AS (
  SELECT DISTINCT unnest(sh) AS s0 FROM shing
), {xxh64_cte("vocab", [], s_col="s0")}, hv AS (
  SELECT s, ((h % {P}) + {P}) % {P} AS hm FROM xx_out
), sr AS (
  SELECT doc_id, unnest(sh) AS s FROM shing
), sigs AS (
  SELECT doc_id, [{sig}] AS sig
  FROM sr JOIN hv USING (s) GROUP BY doc_id
), banded AS (
  SELECT doc_id, u.b,
         array_to_string(sig[u.b*{rows}+1 : u.b*{rows}+{rows}], ',') AS band_key
  FROM sigs, (SELECT unnest(range({bands})) AS b) u
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM banded a JOIN banded c
    ON a.b = c.b AND a.band_key = c.band_key AND a.doc_id < c.doc_id
)
SELECT id_a, id_b, jaccard FROM (
  SELECT cand.id_a, cand.id_b,
         CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
           / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
  FROM cand JOIN shing x ON x.doc_id = cand.id_a
            JOIN shing y ON y.doc_id = cand.id_b) v
WHERE jaccard >= 0.5
ORDER BY id_a, id_b"""


def simhash_oracle(max_hamming=3, max_bucket=10000):
    bit_votes = "\n       + ".join(
        f"(CASE WHEN sum(CAST((hu // {1 << b}) % 2 AS BIGINT) * 2 - 1) > 0 "
        f"THEN CAST({1 << b} AS HUGEINT) ELSE 0 END)" for b in range(64))
    return f"""WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), occ AS (
  SELECT doc_id, unnest(toks) AS s FROM t WHERE len(toks) > 0
), vocab AS (
  SELECT DISTINCT s AS s0 FROM occ
), {xxh64_cte("vocab", [], s_col="s0")}, hv AS (
  SELECT s, CAST(h AS HUGEINT) + CASE WHEN h < 0
            THEN 18446744073709551616 ELSE 0 END AS hu
  FROM xx_out
), sh AS (
  SELECT doc_id,
       {bit_votes} AS su
  FROM occ JOIN hv USING (s) GROUP BY doc_id
), s AS (
  SELECT doc_id, su,
         CAST(su - CASE WHEN su >= 9223372036854775808
              THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS simhash
  FROM sh
), chunked AS (
  SELECT doc_id, su, simhash, u.c,
         CAST((su // (1 << (u.c * 16))) % 65536 AS BIGINT) AS chunk_val
  FROM s, (SELECT unnest(range(4)) AS c) u
), cold AS (
  SELECT ch.* FROM chunked ch
  JOIN (SELECT c, chunk_val FROM chunked GROUP BY c, chunk_val
        HAVING count(*) <= {max_bucket}) ok
    ON ch.c = ok.c AND ch.chunk_val = ok.chunk_val
)
SELECT id_a, id_b, hamming FROM (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST(bit_count(xor(CAST(a.su AS UBIGINT), CAST(b.su AS UBIGINT)))
              AS INT) AS hamming
  FROM cold a JOIN cold b
    ON a.c = b.c AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id) p
WHERE hamming <= {max_hamming}
ORDER BY id_a, id_b"""


if __name__ == "__main__":
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r10"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sfdir}/documents.parquet')")
    for name, sql in [("q_dedup_minhash", minhash_oracle()),
                      ("q_dedup_simhash", simhash_oracle())]:
        exp = con.execute(sql).fetchdf()
        got = pd.read_parquet(f"{outdir}/{name}")
        ec = sorted(exp.columns)
        exp = exp[ec].sort_values(by=ec).reset_index(drop=True)
        got = got[ec].sort_values(by=ec).reset_index(drop=True)
        same = len(exp) == len(got) and all(
            (got[c].astype(float).round(12).equals(exp[c].astype(float).round(12))
             if exp[c].dtype.kind == "f" else got[c].equals(exp[c]))
            for c in ec)
        print(name, "PASS" if same else "FAIL",
              f"spark={len(got)} oracle={len(exp)}")
        if not same:
            print("spark:\n", got.head(30))
            print("oracle:\n", exp.head(30))
