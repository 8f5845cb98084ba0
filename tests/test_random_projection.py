"""JL random projection: the distance-preservation contract.

Oracle parity (engine equivalence) is covered by test_queries_oracle;
this test pins the reason the operator EXISTS — projected pairwise
distances must track original distances well enough to drive nearest-
neighbor style downstream ops (SemDeDup / IVF front end).
"""

from __future__ import annotations

import numpy as np

from legendary_data_pipeline_spark.catalog import load_table
from legendary_data_pipeline_spark.operators import similarity as S


def _pdist2(M):
    g = (M * M).sum(axis=1)
    return g[:, None] + g[None, :] - 2.0 * (M @ M.T)


def test_jl_bounds_distortion_on_fixture(spark, sf_dir):
    """Fixture embeddings are near-uniform on the sphere: pairwise
    distances barely vary, so the JL guarantee shows up as BOUNDED
    per-pair distortion, not rank correlation."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = S.random_projection(emb, out_dims=32)
    rows = (
        emb.join(proj.select("vec_id", "proj"), "vec_id")
        .select("vec_id", "embedding", "proj")
        .filter("vec_id < 80")
        .collect()
    )
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    P = np.array([r["proj"] for r in rows], dtype=np.float64)
    assert P.shape[1] == 32
    iu = np.triu_indices(len(rows), k=1)
    dx, dp = _pdist2(X)[iu], _pdist2(P)[iu]
    ratio = dp / np.maximum(dx, 1e-12)
    assert 0.8 < np.median(ratio) < 1.2, np.median(ratio)
    # k=32 concentration: the bulk of pairs lands within ~2x
    assert np.quantile(ratio, 0.95) < 2.2
    assert np.quantile(ratio, 0.05) > 0.35


def test_jl_preserves_structure_on_clustered_data(spark):
    """Where distances DO vary (clustered data), the projection must
    rank them like the original space — the property ANN front-ends
    rely on."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(3, 64)) * 8.0
    X = np.vstack(
        [c + rng.normal(size=(20, 64)) for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], 0) for i in range(len(X))],
        "vec_id long, embedding array<float>, label int",
    )
    k = 48
    P_rows = (
        S.random_projection(df, out_dims=k)
        .select("vec_id", "proj")
        .collect()
    )
    P = np.array(
        [r["proj"] for r in sorted(P_rows, key=lambda r: r["vec_id"])]
    )
    Xf = X.astype(np.float32).astype(
        np.float64
    )  # match the float32 round-trip through the array<float> column
    # the Spark column program IS the matrix product
    expect = (Xf @ np.array(S.jl_signs(k, 64)).T) * (k ** -0.5)
    assert np.allclose(P, expect, rtol=1e-9, atol=1e-9)
    iu = np.triu_indices(len(X), k=1)
    dx, dp = _pdist2(Xf)[iu], _pdist2(P)[iu]
    corr = np.corrcoef(dx, dp)[0, 1]
    assert corr > 0.9, corr


def test_jl_signs_deterministic_and_balanced():
    a = S.jl_signs(4, 64)
    b = S.jl_signs(4, 64)
    assert a == b
    flat = [v for row in a for v in row]
    assert set(flat) == {1.0, -1.0}
    # md5-derived bits are balanced: neither sign dominates
    pos = sum(1 for v in flat if v > 0)
    assert 0.35 < pos / len(flat) < 0.65
