#!/usr/bin/env python3
"""Prototype: Spark-compatible xxhash64 (XXH64, seed 42) as pure DuckDB SQL.

Validated against pyspark's xxhash64 before being ported to Scala
(SparkEntry.xxh64Cte).  Strategy: staged CTE chain (no expression blowup),
HUGEINT arithmetic in [0, 2^64), wrapping multiply via 32-bit split,
rotl via mod/div, loops as list_reduce folds seeded with list_prepend.
"""
M = 1 << 64
P1 = 11400714785074694791
P2 = 14029467366897019727
P3 = 1609587929392839161
P4 = 9650029242287828579
P5 = 2870177450012600261
SEED = 42


def mul(a, b):
    return (f"((({a}) % 4294967296) * (({b}) % 4294967296) + "
            f"(((({a}) % 4294967296) * (({b}) // 4294967296) + "
            f"(({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296) "
            f"* 4294967296) % 18446744073709551616")


def add(a, b):
    return f"((({a}) + ({b})) % 18446744073709551616)"


def rotl(x, r):
    lo = 1 << (64 - r)
    return f"((({x}) % {lo}) * {1 << r} + ({x}) // {lo})"


def xor(a, b):
    return (f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) "
            f"AS HUGEINT)")


def shr(x, n):
    return f"(({x}) // {1 << n})"


def fold(init, lst, body):
    return (f"list_reduce(list_prepend(CAST({init} AS HUGEINT), {lst}), "
            f"(a, x) -> {body})")


def xxh64_cte(in_cte, key_cols, s_col="s", out="h"):
    """CTE chain computing `out` = Spark xxhash64(`s_col`) (signed BIGINT)
    for every row of `in_cte`, carrying `key_cols` through.  The final CTE
    is named xx_out."""
    keys = ", ".join(key_cols) + (", " if key_cols else "")
    # lane fold step: acc = rotl(acc + w*P2, 31) * P1
    lane = mul(rotl(add("a", mul("x", P2)), 31), P1)
    word8 = " + ".join(f"b[j*8+{k+1}] * {1 << (8 * k)}" for k in range(8))
    u32 = " + ".join(f"b[(n // 8) * 8 + {k+1}] * {1 << (8 * k)}" for k in range(4))

    def lane_fold(init, lane_idx):
        lst = f"list_transform(range(0, n // 32), j -> w[4*j+{lane_idx}])"
        return fold(init % M, lst, lane)

    mrg = add(add(add(rotl("v1", 1), rotl("v2", 7)), rotl("v3", 12)),
              rotl("v4", 18))

    def merge_round(h, v):
        k = mul(rotl(mul(v, P2), 31), P1)
        return add(mul(xor(h, k), P1), P4)

    # word-tail step: h = rotl(h ^ (rotl(w*P2,31)*P1), 27) * P1 + P4
    wstep = add(mul(rotl(xor("a", mul(rotl(mul("x", P2), 31), P1)), 27), P1), P4)
    # byte-tail step: h = rotl(h ^ (byte*P5), 11) * P1
    bstep = mul(rotl(xor("a", mul("x", P5)), 11), P1)

    h4step = add(mul(rotl(xor("h1", mul(f"({u32})", P1)), 23), P2), P3)

    return f"""xx_b AS (
  SELECT {keys}{s_col} AS s,
         list_transform(regexp_extract_all(hex(encode({s_col})), '..'),
           p -> CAST(CAST(('0x' || p) AS BIGINT) AS HUGEINT)) AS b
  FROM {in_cte}
), xx_n AS (
  SELECT *, len(b) AS n,
         list_transform(range(0, len(b) // 8), j -> {word8}) AS w
  FROM xx_b
), xx_v AS (
  SELECT *,
    CASE WHEN n >= 32 THEN {lane_fold(SEED + P1 + P2, 1)} END AS v1,
    CASE WHEN n >= 32 THEN {lane_fold(SEED + P2, 2)} END AS v2,
    CASE WHEN n >= 32 THEN {lane_fold(SEED, 3)} END AS v3,
    CASE WHEN n >= 32 THEN {lane_fold(SEED - P1, 4)} END AS v4
  FROM xx_n
), xx_m0 AS (
  SELECT *, CASE WHEN n >= 32 THEN {mrg} END AS mh FROM xx_v
), xx_m1 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_round("mh", "v1")} END AS mh1 FROM xx_m0
), xx_m2 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_round("mh1", "v2")} END AS mh2 FROM xx_m1
), xx_m3 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_round("mh2", "v3")} END AS mh3 FROM xx_m2
), xx_m4 AS (
  SELECT *, CASE WHEN n >= 32 THEN {merge_round("mh3", "v4")} END AS mh4 FROM xx_m3
), xx_h0 AS (
  SELECT *, ((CASE WHEN n >= 32 THEN mh4 ELSE {(SEED + P5) % M} END) + n)
            % 18446744073709551616 AS h0
  FROM xx_m4
), xx_h1 AS (
  SELECT *, {fold("h0", "w[(n // 32) * 4 + 1 : n // 8]", wstep)} AS h1 FROM xx_h0
), xx_h2 AS (
  SELECT *, CASE WHEN n % 8 >= 4 THEN {h4step} ELSE h1 END AS h2 FROM xx_h1
), xx_h3 AS (
  SELECT *, {fold("h2",
      "b[(n // 8) * 8 + (CASE WHEN n % 8 >= 4 THEN 4 ELSE 0 END) + 1 : n]",
      bstep)} AS h3
  FROM xx_h2
), xx_f1 AS (
  SELECT *, {mul(xor("h3", shr("h3", 33)), P2)} AS f1 FROM xx_h3
), xx_f2 AS (
  SELECT *, {mul(xor("f1", shr("f1", 29)), P3)} AS f2 FROM xx_f1
), xx_out AS (
  SELECT {keys}s,
         CAST({xor("f2", shr("f2", 32))} - CASE
           WHEN {xor("f2", shr("f2", 32))} >= 9223372036854775808
           THEN 18446744073709551616 ELSE 0 END AS BIGINT) AS {out}
  FROM xx_f2
)"""


def xxh64_ref(data: bytes, seed: int = SEED) -> int:
    if True:
        def m(x):
            return x % M
        n = len(data)

        def word(i, k):
            return int.from_bytes(data[i:i + k], "little")
        i = 0
        if n >= 32:
            v = [m(seed + P1 + P2), m(seed + P2), seed, m(seed - P1)]
            while i + 32 <= n:
                for l in range(4):
                    acc = m(v[l] + m(word(i + 8 * l, 8) * P2))
                    acc = m((acc << 31) | (acc >> 33))
                    v[l] = m(acc * P1)
                i += 32
            h = m(((v[0] << 1) | (v[0] >> 63)) + ((v[1] << 7) | (v[1] >> 57))
                  + ((v[2] << 12) | (v[2] >> 52)) + ((v[3] << 18) | (v[3] >> 46)))
            for l in range(4):
                k = m(v[l] * P2)
                k = m((k << 31) | (k >> 33))
                k = m(k * P1)
                h = m(m((h ^ k) * P1) + P4)
        else:
            h = m(seed + P5)
        h = m(h + n)
        while i + 8 <= n:
            k = m(word(i, 8) * P2)
            k = m((k << 31) | (k >> 33))
            k = m(k * P1)
            h ^= k
            h = m(((h << 27) | (h >> 37)))
            h = m(m(h * P1) + P4)
            i += 8
        if i + 4 <= n:
            h ^= m(word(i, 4) * P1)
            h = m((h << 23) | (h >> 41))
            h = m(m(h * P2) + P3)
            i += 4
        while i < n:
            h ^= m(data[i] * P5)
            h = m((h << 11) | (h >> 53))
            h = m(h * P1)
            i += 1
        h ^= h >> 33
        h = m(h * P2)
        h ^= h >> 29
        h = m(h * P3)
        h ^= h >> 32
        return h - M if h >= (1 << 63) else h


TESTS = ["", "a", "ab", "abc", "abcd", "hello world", "x" * 31, "x" * 32,
             "x" * 33, "x" * 40, "y" * 63, "y" * 64, "z" * 65, "w" * 100,
         "the quick brown fox jumps over the lazy dog repeatedly today",
         "héllo wörld ünïcode", "日本語テキスト", "tab\tnew\nline"]


if __name__ == "__main__":
    import duckdb
    tests = TESTS
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
                ", ".join(f"({i}, ?)" for i in range(len(tests))) +
                ") v(k, s)", tests)
    sql = "WITH " + xxh64_cte("t", ["k"]) + " SELECT k, s, h FROM xx_out ORDER BY k"
    rows = con.sql(sql).fetchall()
    ok = True
    for k, s, h in rows:
        ref = xxh64_ref(s.encode("utf-8"))
        if h != ref:
            ok = False
            print(f"MISMATCH k={k} s={s!r} duckdb={h} ref={ref}")
    print("self-check vs python ref:", "PASS" if ok else "FAIL", f"({len(rows)} cases)")
