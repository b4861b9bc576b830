"""Macau on ChEMBL-IC50-shaped data with ECFP side features — the
reference README's flagship example (compound x target pIC50, sparse
binary compound fingerprints, blocked-CG link-matrix solver,
class_cut = log10(200) active/inactive AUC)."""
import argparse

import bayesiandatafusion_jl_tpu as bdf
from bayesiandatafusion_jl_tpu.models.datasets import synthetic_chembl

parser = argparse.ArgumentParser()
parser.add_argument("--compounds", type=int, default=15_000)
parser.add_argument("--features", type=int, default=32_000)
parser.add_argument("--num-latent", type=int, default=32)
parser.add_argument("--burnin", type=int, default=200)
parser.add_argument("--psamples", type=int, default=100)
parser.add_argument("--save-prefix", default=None,
                    help="dump posterior samples for out-of-matrix use")
args = parser.parse_args()

rd = synthetic_chembl(n_compounds=args.compounds,
                      n_features=args.features)
rd.assign_to_test("ic50", 20_000)

result = bdf.macau(rd, num_latent=args.num_latent, burnin=args.burnin,
                   psamples=args.psamples, use_ff=False,
                   gram_dtype="bfloat16", output_prefix=args.save_prefix)
print(f"\nRMSE: {result['RMSE']:.4f}  AUC: {result['AUC']:.4f}  "
      f"accuracy: {result['accuracy']:.3f}")

if args.save_prefix:
    # out-of-matrix prediction for new compounds via saved beta/mu
    import numpy as np
    x_new = (np.random.default_rng(0).random((5, args.features)) < 0.001)
    preds = bdf.predict_out_of_matrix(args.save_prefix, x_new.astype(float))
    print("new-compound predictions:", preds.shape)
