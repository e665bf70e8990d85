"""LSH parameter planner — the driver-side "optimizer" (SURVEY.md F7/F8).

The reference derives its family size from dataset statistics:
    p1 = p(w), p2 = p(w/c)      collision probs of the p-stable family
        p(x) = 1 - 2*Phi(-x) - (2/(sqrt(2*pi)*x))*(1 - e^{-x^2/2})
                                  (MapReduce-LSH/.../common/LSH.java:106-115)
    m = ceil(ln n / ln(1/p2))     projections per table  (LSH.java:84-96)
    L = ceil(1 / p1^m)            number of tables       (LSH.java:97-104)
    nRadii = 1 + floor(log_c(sqrt(d)*t))   (Statistician.java:132-134)

The MinHash graft keeps the same AND/OR reasoning with the textbook MinHash
collision model: a pair at Jaccard s collides in one band of r rows with
prob s^r, anywhere with prob 1 - (1 - s^r)^b.  `plan_bands` chooses (b, r)
given a signature length and target threshold; `reference_parameters` is
the bit-faithful reproduction of the reference derivation (used by the ANN
parity module and its tests).
"""

from __future__ import annotations

import math
from dataclasses import dataclass


# ---------------------------------------------------------------- reference

def _standard_normal_cdf(x: float) -> float:
    return 0.5 * (1.0 + math.erf(x / math.sqrt(2.0)))


def collision_probability(x: float) -> float:
    """p(x) for the 2-stable (Gaussian) family with bucket width x = w/R
    (LSH.java:106-115; closed form via erf instead of the reference's
    1e-4-step numeric integration of the pdf — agrees to ~1e-8)."""
    return (1.0
            - 2.0 * _standard_normal_cdf(-x)
            - (2.0 / (math.sqrt(2.0 * math.pi) * x)) * (1.0 - math.exp(-(x * x) / 2.0)))


@dataclass(frozen=True)
class ReferenceParams:
    m: int          # projections per table (AND width)
    L: int          # tables (OR width)
    n_radii: int
    p1: float
    p2: float


def reference_parameters(n: int, d: int, t: int, c: float = 2.0,
                         w: float = 4.0) -> ReferenceParams:
    """Reproduce LSH.calcParameters (LSH.java:74-104) + radius count
    (Statistician.java:132-134)."""
    p1 = collision_probability(w)
    p2 = collision_probability(w / c)
    m = math.ceil(math.log(n) / math.log(1.0 / p2))
    L = math.ceil(1.0 / (p1 ** m))
    n_radii = 1 + int(math.floor(math.log(math.sqrt(d) * t) / math.log(c)))
    return ReferenceParams(m=m, L=L, n_radii=n_radii, p1=p1, p2=p2)


# ---------------------------------------------------------------- MinHash

def minhash_collision_prob(s: float, b: int, r: int) -> float:
    return 1.0 - (1.0 - s ** r) ** b


def plan_bands(num_perm: int, target_jaccard: float,
               min_recall: float = 0.99) -> tuple[int, int]:
    """Choose (b, r) with b*r == num_perm maximizing candidate precision
    subject to collision prob >= min_recall at target_jaccard.

    Mirrors the reference's 'enough tables to hit recall, as many
    projections as affordable' derivation (F8) for the MinHash family.
    """
    best: tuple[int, int] | None = None
    for r in range(1, num_perm + 1):
        if num_perm % r:
            continue
        b = num_perm // r
        if minhash_collision_prob(target_jaccard, b, r) >= min_recall:
            if best is None or r > best[1]:   # larger r = fewer false candidates
                best = (b, r)
    if best is None:
        raise ValueError(
            f"no (b, r) with b*r={num_perm} reaches recall {min_recall} "
            f"at jaccard {target_jaccard}; increase num_perm")
    return best
