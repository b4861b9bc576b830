"""Counter-based RNG plumbing with an injection seam.

Design (SURVEY.md §9.0/§9.2): every sampler consumes its Gaussian/Gamma draws
from a *randoms pytree* built ahead of the sweep step.  The default path
builds that pytree on-device with threefry (`jax.random`), keyed by
``fold_in(sweep_key, crc32(name))`` so streams are order- and
sharding-independent.  For oracle-equivalence tests the same pytree is built
in NumPy float64 and fed to both the engine and the oracle — this is the
"RNG-injection seam" that replaces bit-matching Julia's MersenneTwister
(reference uses global `rand`/`randn`; src/macau.jl [MED]).

All Gamma draws are *standard* gamma (scale 1) with static shape parameters:
every Gibbs conditional here has a static Gamma shape (nu+F*K)/2, a0+n/2,
Bartlett chi2 dfs), only the *rate* is state-dependent — so rate scaling
happens inside the sampler and the draw itself is precomputable.
"""
from __future__ import annotations

import dataclasses
import zlib
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DrawSpec:
    """One named random draw: standard normal or standard gamma."""

    kind: str  # "normal" | "gamma"
    shape: Tuple[int, ...]
    # for gamma: static shape parameter(s), broadcastable to `shape`
    gamma_a: Optional[Tuple[float, ...]] = None


RandomSpec = Dict[str, DrawSpec]


def _name_salt(name: str) -> int:
    return zlib.crc32(name.encode("utf-8"))


def draw_all(key: jax.Array, spec: RandomSpec, dtype) -> Dict[str, jax.Array]:
    """Build the randoms pytree on device (threefry; inside jit)."""
    out = {}
    for name, d in spec.items():
        sub = jax.random.fold_in(key, _name_salt(name))
        if d.kind == "normal":
            out[name] = jax.random.normal(sub, d.shape, dtype)
        elif d.kind == "gamma":
            a = jnp.asarray(d.gamma_a, dtype).reshape(-1)
            a = jnp.broadcast_to(a, d.shape) if d.shape else a[0]
            out[name] = jax.random.gamma(sub, a, dtype=dtype)
        else:
            raise ValueError(f"unknown draw kind {d.kind}")
    return out


def draw_all_numpy(rng: np.random.Generator, spec: RandomSpec, dtype=np.float64):
    """Build the same-shaped randoms pytree with NumPy (for the oracle seam)."""
    out = {}
    for name, d in spec.items():
        if d.kind == "normal":
            out[name] = rng.standard_normal(d.shape).astype(dtype)
        elif d.kind == "gamma":
            a = np.asarray(d.gamma_a, np.float64).reshape(-1)
            a = np.broadcast_to(a, d.shape) if d.shape else a[0]
            g = rng.gamma(shape=a, scale=1.0)
            out[name] = np.asarray(g, dtype).reshape(d.shape)
        else:
            raise ValueError(f"unknown draw kind {d.kind}")
    return out


def sweep_key(base_key: jax.Array, sweep_index) -> jax.Array:
    """Per-sweep key; stable under resume (counter-based, SURVEY §7.4)."""
    return jax.random.fold_in(base_key, sweep_index)
