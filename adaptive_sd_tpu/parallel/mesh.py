"""Device-mesh construction: ICI/DCN axes, cascade tier slices, CPU test mesh.

Role parity: the reference's per-stage GPU placement
(``configs/qwen3_models.yaml``: 7B gpu[0], 14B gpu[1], 32B gpu[2,3],
72B gpu[4-7]; ``src/serving/server.py:140-146``) — re-expressed TPU-first as
*disjoint mesh slices of one pod slice per cascade tier* plus a (dp, tp) mesh
within each tier (SURVEY.md §2.8). NCCL has no analog here: collectives are
XLA's, routed over ICI by GSPMD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..core.exceptions import ShardingError

# Canonical axis names: dp = data (batch) parallel, tp = tensor parallel,
# dcn = the cross-host data-center-network axis (slowest; outermost).
AXIS_DP = "dp"
AXIS_TP = "tp"
AXIS_DCN = "dcn"


def build_mesh(
    dp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dp, tp) mesh over the given devices (default: all). tp is the minor
    axis so tensor-parallel collectives ride neighbouring ICI links."""
    devs = list(devices) if devices is not None else jax.devices()
    if dp * tp != len(devs):
        raise ShardingError(
            f"mesh {dp}x{tp} needs {dp * tp} devices, have {len(devs)}"
        )
    arr = np.asarray(devs).reshape(dp, tp)
    return Mesh(arr, (AXIS_DP, AXIS_TP))


@dataclass(frozen=True)
class TierPlacement:
    """A cascade tier pinned to a slice of the pod's devices."""

    name: str
    device_ids: tuple[int, ...]
    dp: int = 1
    tp: int = 1

    def mesh(self, all_devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
        devs = list(all_devices) if all_devices is not None else jax.devices()
        try:
            chosen = [devs[i] for i in self.device_ids]
        except IndexError as exc:
            raise ShardingError(
                f"tier {self.name} wants devices {self.device_ids}, "
                f"only {len(devs)} present"
            ) from exc
        return build_mesh(self.dp, self.tp, chosen)


def plan_tier_placements(
    tier_names: Sequence[str],
    tier_weights_bytes: Sequence[int],
    n_devices: int,
    device_hbm_bytes: int = 16 << 30,
    kv_fraction: float = 0.3,
) -> list[TierPlacement]:
    """Partition a pod slice into disjoint per-tier sub-meshes sized by weight
    footprint (the reference's hand-written GPU map, computed instead).

    Greedy: each tier gets the smallest power-of-two device count whose pooled
    HBM fits weights/(1-kv_fraction); remaining devices are handed to tiers
    round-robin (largest first) to widen tp for latency.
    """
    if len(tier_names) != len(tier_weights_bytes):
        raise ValueError("names/weights length mismatch")
    needs = []
    for w in tier_weights_bytes:
        need = 1
        while need * device_hbm_bytes * (1 - kv_fraction) < w:
            need *= 2
        needs.append(need)
    total = sum(needs)
    if total > n_devices:
        raise ShardingError(
            f"cascade needs >= {total} devices ({list(zip(tier_names, needs))}), "
            f"have {n_devices}"
        )
    # hand out spare devices to the largest tiers (doubling keeps power-of-2 tp)
    spare = n_devices - total
    order = sorted(range(len(needs)), key=lambda i: -tier_weights_bytes[i])
    for i in order:
        if spare >= needs[i]:
            spare -= needs[i]
            needs[i] *= 2
    placements = []
    cursor = 0
    for name, n in zip(tier_names, needs):
        placements.append(
            TierPlacement(name=name, device_ids=tuple(range(cursor, cursor + n)), dp=1, tp=n)
        )
        cursor += n
    return placements


def build_multihost_mesh(
    dp: int = 1,
    tp: int = 1,
    dcn: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """(dcn, dp, tp) mesh for multi-host slices: the dcn axis is outermost so
    only data-parallel collectives (cheap, infrequent) cross hosts while
    tensor-parallel collectives stay on intra-host/slice ICI — the
    scaling-book recipe. ``dcn`` defaults to ``jax.process_count()``.

    On a single process this degenerates to a 3-axis mesh over local devices
    (dcn=1), so sharding rules written against all three axes test on the
    virtual CPU mesh unchanged.
    """
    devs = list(devices) if devices is not None else jax.devices()
    n_dcn = dcn if dcn is not None else max(jax.process_count(), 1)
    if n_dcn * dp * tp != len(devs):
        raise ShardingError(
            f"mesh {n_dcn}x{dp}x{tp} needs {n_dcn * dp * tp} devices, have {len(devs)}"
        )
    arr = np.asarray(devs).reshape(n_dcn, dp, tp)
    return Mesh(arr, (AXIS_DCN, AXIS_DP, AXIS_TP))


def virtual_cpu_devices(n: int = 8) -> list[jax.Device]:
    """The CPU test mesh (conftest forces XLA host-platform device count)."""
    devs = jax.devices()
    if len(devs) < n:
        raise ShardingError(
            f"need {n} virtual devices; set "
            f"XLA_FLAGS=--xla_force_host_platform_device_count={n} before jax init"
        )
    return devs[:n]
