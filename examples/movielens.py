"""BPMF on MovieLens — the reference README's first example.

Synthetic shape-matched data is generated when the real ratings file is
absent (zero-egress sandbox); pass --data /path/to/u.data to use real
MovieLens.
"""
import argparse

import bayesiandatafusion_jl_tpu as bdf
from bayesiandatafusion_jl_tpu.models.datasets import load_movielens

parser = argparse.ArgumentParser()
parser.add_argument("--data", default=None, help="u.data / ratings.dat path")
parser.add_argument("--variant", default="100k", choices=["100k", "1m", "10m"])
parser.add_argument("--num-latent", type=int, default=32)
parser.add_argument("--burnin", type=int, default=100)
parser.add_argument("--psamples", type=int, default=100)
args = parser.parse_args()

df = load_movielens(args.variant, path=args.data)
rd = bdf.RelationData.from_indexed_df(df, relation_name="ratings")
rd.assign_to_test(0, df.nnz // 10)

result = bdf.macau(rd, num_latent=args.num_latent, burnin=args.burnin,
                   psamples=args.psamples, clamp=[1.0, 5.0],
                   gram_dtype="bfloat16")
print(f"\nposterior-mean RMSE: {result['RMSE']:.4f}")
