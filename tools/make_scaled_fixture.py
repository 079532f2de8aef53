"""Synthesize a larger fixture by stacking offset copies of an existing
one — the 10x scale-up rig.

Each copy c shifts every KEY column by c * stride so referential
integrity holds across tables (an order's o_custkey still points at a
customer row in the same copy), while non-key attributes repeat. The
result is a dataset with c-times the rows and the SAME per-key
cardinality profile — exactly what you want for "does the plan survive
10x" checks: shuffles, joins and windows see 10x volume but no new
skew.

Timestamps also shift per copy (+c days) so time-series queries see a
longer, denser history instead of 10 identical overlapping days.

CONSTANT-DUPLICATE-DENSITY mode (4th arg ``perturb``): plain stacking
makes every copied document/embedding an EXACT duplicate of copy 0, so
the near-dup pair-emitters (minhash/simhash/jaccard/embedding-cosine)
legitimately emit O(copies^2) extra pairs — output-bound, but it hides
whether the OPERATOR scales linearly at constant duplicate density. In
perturb mode copy c > 0:
  * documents.text goes through a per-copy alphabet rotation
    (``translate``): a bijection on tokens, so WITHIN-copy Jaccard /
    shingle structure (and hence the base fixture's planted near-dup
    rate) is preserved exactly, while CROSS-copy token sets become
    disjoint — no cross-copy candidate pairs, duplicate density stays
    at the base rate;
  * embeddings.embedding goes through a per-copy SIGNED PERMUTATION
    (circular shift + hash-driven sign flips): orthogonal, so
    within-copy distances/norms are bit-preserved, while cross-copy
    cosine decorrelates below any near-dup threshold.
Radius pairs are NOT perturbed: their coordinates already differ per
copy (md5 of the offset key), and their pair growth is areal point
density (n^2 r^2 / A in a fixed plane) — physics, not duplication.

Usage: python tools/make_scaled_fixture.py [src_sf_dir] [out_dir] [copies] [perturb]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_1_spark.io import TABLES  # noqa: E402
from data_engineering_1_spark.session import get_spark  # noqa: E402

STRIDE = 10_000_000

# key columns to offset, per table (referential integrity preserved)
KEYS = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
TS_COLS = {"events": ["ts"], "orders": ["o_orderdate"], "lineitem": ["l_shipdate"]}


_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def _affine_translate(col_name: str, c: int) -> F.Column:
    """Copy-c affine cipher i -> (a*i + b) mod 26 over ``col_name``:
    a coprime to 26, never the identity for c > 0. A plain rotation has
    only 25 distinct maps, so copies 25+ would repeat earlier copies'
    text VERBATIM and mint exact cross-copy duplicates (caught in the
    r6 30x probe); the affine family gives 312 distinct bijections.
    A character bijection preserves within-copy token/shingle identity
    AND per-character edit distance exactly, while cross-copy strings
    decorrelate."""
    _AS = [3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25, 1]
    a = _AS[c % 12]
    b = c // 12 + (1 if a == 1 else 0)  # never (a=1, b=0) = identity
    perm = [(a * i + b) % 26 for i in range(26)]
    src = _ALPHA + _ALPHA.upper()
    dst = (
        "".join(_ALPHA[p] for p in perm)
        + "".join(_ALPHA.upper()[p] for p in perm)
    )
    return F.translate(F.col(col_name), src, dst)


def _perturb_copy(cur, name, c):
    """Copy-c decorrelation (no-op for copy 0 and non-dup tables)."""
    if c == 0:
        return cur
    if name == "documents":
        cur = cur.withColumn("text", _affine_translate("text", c))
    elif name == "part":
        # the affine family on p_name keeps the base fixture's planted
        # fuzzy near-dup rate per copy (edit distances preserved), so
        # the ER family (fuzzy_name_pairs_part / edit1 /
        # golden_record_fusion) probes at constant duplicate density
        # instead of the 100x exact-clone output blowup plain stacking
        # mints (brand/size blocking keys stay untouched, so the
        # candidate-pair space still grows with the block — the probe
        # measures the OPERATOR, not the output).
        cur = cur.withColumn("p_name", _affine_translate("p_name", c))
    elif name == "embeddings":
        cur = cur.withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(0, size(embedding) - 1), i -> "
                f"element_at(embedding, "
                f"(i + {c}) % size(embedding) + 1) * "
                f"CASE WHEN pmod(hash(i, {c}), 2) = 0 "
                f"THEN CAST(1.0 AS FLOAT) ELSE CAST(-1.0 AS FLOAT) END)"
            ),
        )
    return cur


def scale_table(spark, src_dir, out_dir, name, copies, perturb=False):
    df = spark.read.parquet(os.path.join(src_dir, f"{name}.parquet"))
    parts = []
    for c in range(copies):
        cur = df
        if perturb:
            cur = _perturb_copy(cur, name, c)
        for k in KEYS.get(name, []):
            cur = cur.withColumn(k, F.col(k) + F.lit(c * STRIDE))
        for t in TS_COLS.get(name, []):
            # preserve each column's ORIGINAL type: a DATE that silently
            # became TIMESTAMP_NTZ would make the 10x sweep test
            # different plans (implicit casts, different stats types)
            # than the ones verified at base scale
            from pyspark.sql import types as T

            dt = dict(df.dtypes)[t]
            if isinstance(df.schema[t].dataType, T.DateType):
                cur = cur.withColumn(t, F.date_add(F.col(t), c))
            else:
                cur = cur.withColumn(
                    t,
                    (F.col(t) + F.expr(f"INTERVAL {c} DAYS")).cast(dt),
                )
        parts.append(cur)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # one physical file per table, matching the driver fixture layout
    # (DuckDB's oracle views read '{table}.parquet' as a single file)
    tmp = os.path.join(out_dir, f"__tmp_{name}")
    out.coalesce(1).write.mode("overwrite").parquet(tmp)
    import glob as _glob
    import shutil

    part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    final = os.path.join(out_dir, f"{name}.parquet")
    if os.path.isdir(final):
        shutil.rmtree(final)
    elif os.path.exists(final):
        os.remove(final)
    shutil.move(part, final)
    shutil.rmtree(tmp)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    perturb = len(sys.argv) > 4 and sys.argv[4] == "perturb"
    spark = get_spark("make_scaled_fixture")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        scale_table(spark, src, out, t, copies, perturb=perturb)
        print(f"{t}: done")
    print(out)


if __name__ == "__main__":
    main()
