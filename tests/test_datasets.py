"""Dataset generators: shape, skew, and end-to-end usability."""
import numpy as np

import bayesiandatafusion_jl_tpu as bdf
from bayesiandatafusion_jl_tpu.models.datasets import (CLASS_CUT_IC50,
                                                       load_movielens,
                                                       synthetic_chembl,
                                                       synthetic_ratings)


def test_synthetic_ratings_shape_and_range():
    df = synthetic_ratings(500, 200, 20_000, seed=1)
    assert df.shape == (500, 200) and df.nnz == 20_000
    assert df.vals.min() >= 1.0 and df.vals.max() <= 5.0
    # skew: top movie should carry far more than the median movie
    deg = df.degrees(1)
    assert deg.max() > 4 * max(np.median(deg), 1)


def test_movielens_loader_fallback_and_parse(tmp_path):
    df = load_movielens("100k")
    assert df.shape == (943, 1682) and df.nnz == 100_000
    # parse path: write a tiny u.data
    p = tmp_path / "u.data"
    p.write_text("1\t10\t4.0\t111\n2\t10\t3.0\t222\n2\t11\t5.0\t333\n")
    df2 = load_movielens(path=str(p))
    assert df2.nnz == 3 and df2.shape == (2, 2)
    assert set(df2.vals.tolist()) == {4.0, 3.0, 5.0}


def test_synthetic_chembl_end_to_end():
    rd = synthetic_chembl(n_compounds=300, n_targets=20, n_features=500,
                          nnz=3000, feat_per_compound=10, seed=2)
    assert rd.entities[0].has_features
    assert rd.relations[0].class_cut == CLASS_CUT_IC50
    rd.assign_to_test(0, 300, seed=1)
    res = bdf.macau(rd, num_latent=4, burnin=8, psamples=8, verbose=False,
                    dtype="float32", use_ff=False, cg_maxiter=50)
    assert np.isfinite(res["RMSE"])
    assert "AUC" in res
