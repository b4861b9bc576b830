"""Multi-relation data fusion over shared entities + a 3-way tensor
relation — reference capability (c) (SURVEY.md §1): e.g. compound x target
IC50 fused with compound x assay outcomes and a compound x target x
cell-context tensor, each with its own noise precision."""
import numpy as np

import bayesiandatafusion_jl_tpu as bdf

rng = np.random.default_rng(0)
nc, nt, na, ncell, k = 2000, 300, 50, 8, 16

Uc = rng.standard_normal((nc, k)) / np.sqrt(k)
Ut = rng.standard_normal((nt, k))
Ua = rng.standard_normal((na, k))
Ux = rng.standard_normal((ncell, k))

def sparse_rel(shape, density, gen):
    mask = rng.random(shape) < density
    idx = np.stack(np.nonzero(mask), 1)
    return bdf.IndexedDF(idx, gen(idx), shape)

compound = bdf.Entity("compound", count=nc)
target = bdf.Entity("target", count=nt)
assay = bdf.Entity("assay", count=na)
cell = bdf.Entity("cell", count=ncell)

rd = bdf.RelationData()
rd.add_relation(
    sparse_rel((nc, nt), 0.05,
               lambda i: (Uc[i[:, 0]] * Ut[i[:, 1]]).sum(1)
               + 0.2 * rng.standard_normal(len(i))),
    "ic50", [compound, target])
rd.add_relation(
    sparse_rel((nc, na), 0.20,
               lambda i: (Uc[i[:, 0]] * Ua[i[:, 1]]).sum(1)
               + 0.3 * rng.standard_normal(len(i))),
    "assay", [compound, assay])
rd.add_relation(
    sparse_rel((nc, nt, ncell), 0.002,
               lambda i: (Uc[i[:, 0]] * Ut[i[:, 1]] * Ux[i[:, 2]]).sum(1)
               + 0.3 * rng.standard_normal(len(i))),
    "context", [compound, target, cell])

rd.assign_to_test("ic50", 3000)
rd.set_precision("assay", 2.0, sample=True)   # Gamma-sampled noise
rd.set_precision("context", 2.0)

result = bdf.macau(rd, num_latent=16, burnin=60, psamples=60)
print(f"\nic50 RMSE: {result['ic50']['RMSE']:.4f}")
