"""Statistical analysis over replica ensembles: Binder cumulant, moments.

The target workload named in SURVEY.md §7.5 / BASELINE.json ("Binder-cumulant
Tc sweep"): run many independent sub-lattice replicas per temperature
(reference replica mode, optimized/README.md:143-199), collect per-replica
magnetization moments, and locate the critical temperature from the Binder
cumulant U4 = 1 - <m^4> / (3 <m^2>^2), whose curves for different lattice
sizes cross at Tc.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class MomentAccumulator:
    """Streaming accumulator of |m| moments over replicas and measurements."""

    n: int = 0
    s1: float = 0.0
    s2: float = 0.0
    s4: float = 0.0

    def add(self, ms: np.ndarray) -> None:
        ms = np.asarray(ms, np.float64)
        self.n += ms.size
        self.s1 += float(np.sum(ms))
        self.s2 += float(np.sum(ms ** 2))
        self.s4 += float(np.sum(ms ** 4))

    @property
    def mean(self) -> float:
        return self.s1 / self.n if self.n else float("nan")

    @property
    def m2(self) -> float:
        return self.s2 / self.n if self.n else float("nan")

    @property
    def m4(self) -> float:
        return self.s4 / self.n if self.n else float("nan")

    def binder_cumulant(self) -> float:
        """U4 = 1 - <m^4>/(3 <m^2>^2); -> 2/3 ordered, -> 0 disordered."""
        if self.n == 0 or self.m2 == 0.0:
            return float("nan")
        return 1.0 - self.m4 / (3.0 * self.m2 ** 2)

    def susceptibility(self, nspins: int, temp: float) -> float:
        """chi = N (<m^2> - <|m|>^2) / T."""
        return nspins * (self.m2 - self.mean ** 2) / temp


def binder_crossing(temps, u4_by_size: dict[int, np.ndarray]) -> float:
    """Estimate Tc as the pairwise crossing of U4(T) curves for two sizes.

    Takes the two largest sizes and linearly interpolates the sign change of
    their difference; returns nan if they never cross in range.
    """
    sizes = sorted(u4_by_size)
    if len(sizes) < 2:
        raise ValueError("need at least two lattice sizes")
    a = np.asarray(u4_by_size[sizes[-2]], np.float64)
    b = np.asarray(u4_by_size[sizes[-1]], np.float64)
    d = a - b
    t = np.asarray(temps, np.float64)
    for i in range(len(t) - 1):
        if d[i] == 0.0:
            return float(t[i])
        if d[i] * d[i + 1] < 0:
            f = d[i] / (d[i] - d[i + 1])
            return float(t[i] + f * (t[i + 1] - t[i]))
    return float("nan")
