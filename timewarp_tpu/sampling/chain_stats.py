"""Markov-chain statistics.

Fixed-shape device outputs (one row per MH iteration, K proposals wide) are
converted here into the reference's flattened chain format -- per chain step
acceptance/probability/energy records (reference: utils/evaluation_utils.py:67-187)
where each iteration contributes the proposals up to and including the first
accepted one.
"""
import dataclasses
import pickle
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ChainStats:
    acceptance_indicator: np.ndarray  # [N] bool
    acceptance: np.ndarray  # [N] min(1, exp(-exponent))
    p_xy: np.ndarray  # [N]
    p_yx: np.ndarray  # [N]
    exponent: np.ndarray  # [N]
    energies_pot: np.ndarray  # [N] proposal potential (kT)
    energies_kin: np.ndarray  # [N]
    energies_pot_delta: np.ndarray  # [N]
    energies_kin_delta: np.ndarray  # [N]
    # Total proposals EVALUATED on device (segments x iters x K) -- the
    # throughput denominator. The flattened arrays above only keep proposals
    # up to each iteration's first acceptance, like the reference.
    num_proposals: int = 0
    # Steady-state throughput: proposals/s measured from the completion of
    # the first segment onward (excludes the one-time XLA compile, whose
    # duration varies 15-90s with remote-compiler load; see sampling/mh.py).
    steady_proposals_per_s: float = 0.0

    def __len__(self):
        return len(self.acceptance)

    _SCALAR_FIELDS = ("num_proposals", "steady_proposals_per_s")

    def __getitem__(self, key):
        return ChainStats(
            **{
                f.name: getattr(self, f.name)[key]
                for f in dataclasses.fields(self)
                if f.name not in self._SCALAR_FIELDS
            },
            num_proposals=self.num_proposals,
            steady_proposals_per_s=self.steady_proposals_per_s,
        )

    def thin(self, step: int) -> "ChainStats":
        return self[::step]

    @property
    def acceptance_rate(self) -> float:
        return float(self.acceptance_indicator.mean())

    def save(self, path):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @staticmethod
    def load(path):
        with open(path, "rb") as f:
            return pickle.load(f)


def flatten_segment(outputs, max_states: Optional[int] = None):
    """Convert fixed-[iters, K] device outputs into flattened ChainStats and
    the number of chain states each iteration contributed (first_idx + 1).

    Vectorized: a [T, K] prefix mask selects the first ``take[t]`` proposals
    of each iteration in order.
    """
    first_idx = np.asarray(outputs.first_idx)
    take = first_idx + 1  # states contributed per iteration
    K = np.asarray(outputs.p_acc).shape[1]
    prefix = np.arange(K)[None, :] < take[:, None]  # [T, K]

    def flat(x):
        return np.asarray(x)[prefix]

    stats = ChainStats(
        acceptance_indicator=flat(outputs.accepted),
        acceptance=flat(outputs.p_acc),
        p_xy=flat(outputs.p_xy),
        p_yx=flat(outputs.p_yx),
        exponent=flat(outputs.exponent),
        energies_pot=flat(outputs.e_pot_y),
        energies_kin=flat(outputs.e_kin_y),
        energies_pot_delta=flat(outputs.e_pot_delta),
        energies_kin_delta=flat(outputs.e_kin_delta),
        num_proposals=int(prefix.shape[0]) * int(K),
    )
    if max_states is not None:
        stats = stats[:max_states]
    return stats, take


def concat_stats(parts):
    return ChainStats(
        **{
            f.name: np.concatenate([getattr(p, f.name) for p in parts], axis=0)
            for f in dataclasses.fields(ChainStats)
            if f.name not in ChainStats._SCALAR_FIELDS
        },
        num_proposals=sum(p.num_proposals for p in parts),
    )
