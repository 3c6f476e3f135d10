#!/usr/bin/env python3
"""Golden-fixture generator (test oracle only — NOT part of the library).

Executes the reference library at /root/reference (read-only) on the
driver testdata with the deterministic LCG target of FIXTURES.md §2 and
dumps full-precision JSON bin tables into src/test/resources/golden/.
scipy/joblib are absent in this container; scipy.stats.norm.cdf is
stubbed with the exact erf identity (same stub FIXTURES.md used).
"""
import sys, os, json, math, types

# --- stub scipy.stats.norm.cdf and joblib before importing the reference
scipy = types.ModuleType("scipy")
stats = types.ModuleType("scipy.stats")
import numpy as np


class _Norm:
    @staticmethod
    def cdf(z):
        vec = np.vectorize(lambda x: 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))
                           if not math.isnan(x) else float("nan"))
        out = vec(np.asarray(z, dtype=float))
        return out if np.ndim(z) else float(out)


stats.norm = _Norm()
scipy.stats = stats
sys.modules["scipy"] = scipy
sys.modules["scipy.stats"] = stats

joblib = types.ModuleType("joblib")


def _parallel(n_jobs=None, verbose=0):
    def run(tasks):
        return [f(*a, **k) for f, a, k in tasks]
    return run


joblib.Parallel = _parallel
joblib.delayed = lambda f: (lambda *a, **k: (f, a, k))
sys.modules["joblib"] = joblib

sys.path.insert(0, "/root/reference")
import pandas as pd
from woe_monotonic_binning.binning import woe_binning, woe_binning_sep, apply_bins


def lcg_target(df):
    k = df["l_orderkey"].astype("int64") * 7919 + df["l_linenumber"].astype("int64")
    u = ((k * 1103515245 + 12345) % (2 ** 31)).astype("float64") / float(2 ** 31)
    z = (df["l_extendedprice"] - 38000.0) / 15000.0
    p = 1.0 / (1.0 + np.exp(-z))
    return (u < p).astype("int64")


def dump(df, path):
    cols = list(df.columns)
    data = [[(None if (isinstance(v, float) and math.isnan(v)) else v) for v in row]
            for row in df.itertuples(index=False)]
    with open(path, "w") as f:
        json.dump({"columns": cols, "rows": data}, f, indent=1)
    print(path, len(data), "rows")


def main():
    # main (not test) resources: SparkEntry builds the q_fit_* oracle
    # literal tables from these fixtures at runtime
    outdir = "/root/repo/src/main/resources/golden"
    os.makedirs(outdir, exist_ok=True)
    for sf, nthr in [("sf0.001", 300), ("sf0.01", 3000)]:
        li = pd.read_parquet(f"/root/testdata/{sf}/lineitem.parquet")
        df = pd.DataFrame({
            "target": lcg_target(li),
            "extendedprice": li["l_extendedprice"].astype("float64"),
            "quantity": li["l_quantity"].astype("float64"),
            "discount": li["l_discount"].astype("float64"),
        })
        print(sf, "rows", len(df), "bad_rate", df.target.mean())
        for col in ["extendedprice", "quantity", "discount"]:
            bins = woe_binning("target", df[["target", col]].copy(), n_threshold=nthr)
            dump(bins, f"{outdir}/{sf}_{col}_n{nthr}.json")
        if sf == "sf0.01":
            # fixtures for the q_fit_* oracle literal tables (the driver
            # verifies at sf0.01): same parameter combos as SparkEntry
            for col in ["extendedprice", "quantity", "discount"]:
                bins = woe_binning("target", df[["target", col]].copy(),
                                   n_threshold=300)
                dump(bins, f"{outdir}/{sf}_{col}_n300.json")
            # per-segment fits (fitByGroup oracle): the reference user's
            # manual filter-then-fit per l_returnflag segment
            for flag in sorted(li["l_returnflag"].unique()):
                sub = df[(li["l_returnflag"] == flag).values]
                for col in ["extendedprice", "quantity"]:
                    bins = woe_binning("target", sub[["target", col]].copy(),
                                       n_threshold=300)
                    dump(bins, f"{outdir}/{sf}_{col}_flag{flag}_n300.json")
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=300, merge_threshold=0.2)
            dump(bins, f"{outdir}/{sf}_extendedprice_n300_mt0.2.json")
            bins = woe_binning_sep("target", "quantity", df[["target", "quantity"]].copy(),
                                   sep_value=1.0, n_threshold=60)
            dump(bins, f"{outdir}/{sf}_quantity_sep1_n60.json")
        if sf == "sf0.001":
            # merge_threshold variant on extendedprice
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=nthr, merge_threshold=0.2)
            dump(bins, f"{outdir}/{sf}_extendedprice_n{nthr}_mt0.2.json")
            # nan-bin variant: null out discount==0 rows' extendedprice
            dfn = df[["target", "extendedprice"]].copy()
            dfn.loc[df["discount"] == 0.0, "extendedprice"] = np.nan
            print("nan rows:", dfn.extendedprice.isna().sum())
            bins = woe_binning("target", dfn, n_threshold=nthr)
            dump(bins, f"{outdir}/{sf}_extendedprice_nan_n{nthr}.json")
            # sentinel variant: quantity has a natural mass at low values;
            # use sep_value = 1.0 on quantity? quantity==1 subset.
            dfs = df[["target", "quantity"]].copy()
            bins = woe_binning_sep("target", "quantity", dfs, sep_value=1.0,
                                   n_threshold=60)
            dump(bins, f"{outdir}/{sf}_quantity_sep1_n60.json")
            # sentinel + merge_threshold combined (threaded into both
            # subset fits, binning.py:36,44)
            bins = woe_binning_sep("target", "quantity",
                                   df[["target", "quantity"]].copy(),
                                   sep_value=1.0, n_threshold=60,
                                   merge_threshold=0.5)
            dump(bins, f"{outdir}/{sf}_quantity_sep1_n60_mt05.json")
            # smaller threshold → more bins (orientation + deeper merge paths)
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=60)
            dump(bins, f"{outdir}/{sf}_extendedprice_n60.json")
            # non-default n_occurences / p_threshold paths
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=300, n_occurences=50)
            dump(bins, f"{outdir}/{sf}_extendedprice_n300_occ50.json")
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=60, p_threshold=0.01)
            dump(bins, f"{outdir}/{sf}_extendedprice_n60_p001.json")
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=60, p_threshold=0.5)
            dump(bins, f"{outdir}/{sf}_extendedprice_n60_p05.json")
            # sort_overload=True on a descending-detected column — pins
            # the inconsistent-outer-edge quirk (SURVEY §2.13 #3)
            bins = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=300, sort_overload=True)
            dump(bins, f"{outdir}/{sf}_extendedprice_n300_overloadT.json")
            # merge_bins on a span of 3 bins (indices 2..4)
            from woe_monotonic_binning.binning import merge_bins
            base = woe_binning("target", df[["target", "extendedprice"]].copy(),
                               n_threshold=300)
            dump(merge_bins(base.copy(), [2, 4]),
                 f"{outdir}/{sf}_extendedprice_n300_mergebins24.json")
            # apply_bins golden: batch fit 3 cols then apply to same frame
            d = {}
            for col in ["extendedprice", "quantity", "discount"]:
                d[col] = woe_binning("target", df[["target", col]].copy(),
                                     n_threshold=300)
            applied = apply_bins(df, d)
            dump(applied.head(200), f"{outdir}/{sf}_apply_head200.json")
            agg = applied.agg(["sum", "mean", "count"]).reset_index(names="stat")
            dump(agg, f"{outdir}/{sf}_apply_agg.json")
            # iv_threshold=0 keeps the ascending (discount) and
            # degenerate-descending (quantity) variables → pins the
            # ascending/left-closed apply branch and remove_100_corr
            applied0 = apply_bins(df, d, iv_threshold=0.0)
            agg0 = applied0.agg(["sum", "mean", "count"]).reset_index(names="stat")
            dump(agg0, f"{outdir}/{sf}_apply_iv0_agg.json")
            # sentinel bins through apply (sep splice edges)
            dsep = {"quantity": woe_binning_sep("target", "quantity",
                                               df[["target", "quantity"]].copy(),
                                               sep_value=1.0, n_threshold=60)}
            asep = apply_bins(df, dsep, iv_threshold=0.0)
            aggs = asep.agg(["sum", "mean", "count"]).reset_index(names="stat")
            dump(aggs, f"{outdir}/{sf}_apply_sep_agg.json")


if __name__ == "__main__":
    main()
