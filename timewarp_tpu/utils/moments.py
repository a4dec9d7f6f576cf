"""Online mean/variance accumulation (Welford).

Reference: utilities/moments.py -- used for running statistics of energies
and observables during long sampling runs.
"""
import numpy as np


class Moments:
    def __init__(self):
        self.count = 0
        self._mean = 0.0
        self._m2 = 0.0

    def update(self, value):
        value = np.asarray(value, dtype=np.float64)
        for v in np.atleast_1d(value).ravel():
            self.count += 1
            delta = v - self._mean
            self._mean += delta / self.count
            self._m2 += delta * (v - self._mean)

    @property
    def mean(self) -> float:
        return float(self._mean)

    @property
    def variance(self) -> float:
        return float(self._m2 / self.count) if self.count > 1 else 0.0

    @property
    def std(self) -> float:
        return float(np.sqrt(self.variance))
