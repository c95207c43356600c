"""Data-parallel multi-sequence tracking over a device mesh.

The reference processes exactly one video in one thread (src/main.cpp:72-111).
The TPU deployment shape is a fleet: S independent sequences tracked
concurrently, each owning its own SlamState, sharded over the mesh's 'seq'
axis — pure data parallelism with zero cross-sequence communication (XLA
inserts none: every collective-free op is elementwise in the seq axis).
Combined with landmark-sharded bundle adjustment (parallel/dist_ba.py, 'lm'
axis) this gives the 2-D scale-out mesh: seq x lm.

Design notes:
- The per-sequence program is the SAME fused step the single-chip engine runs
  (slam.pipeline.slam_step_batch); vmap lifts it over the sequence axis and
  NamedSharding('seq') places each sequence's state/frames on its device.
  Under vmap, lax.cond lowers to select (both branches execute) — the price
  of lockstep SPMD tracking; keyframe commits are a minority of frames, and
  all sequences share one compiled program.
- Host side, each sequence keeps its own video decoder; frames are stacked
  [S, N, H, W] and device_put with the sequence sharding, so each chip only
  receives its own sequences' bytes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.camera import Camera
from ..slam.config import SlamConfig
from ..slam.pipeline import slam_step_batch
from ..slam.state import SlamState
from .mesh import put_sharded


def batched_state(S: int, F: int, Pcap: int, O: int, K: int, D: int) -> SlamState:
    """A stacked SlamState for S sequences (leading axis on every leaf)."""
    one = SlamState.create(F=F, P=Pcap, O=O, K=K, D=D)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (S,) + x.shape), one)


def seq_sharding(mesh: Mesh, axis: str = "seq"):
    """NamedSharding placing the leading (sequence) axis on `axis`."""
    return NamedSharding(mesh, P(axis))


def shard_states(states: SlamState, mesh: Mesh, axis: str = "seq") -> SlamState:
    sh = seq_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), states)


def multi_sequence_step(
    mesh: Mesh,
    *,
    cam: Camera,
    cfg: SlamConfig,
    frontend,
    axis: str = "seq",
):
    """Build the jitted S-sequence batched tracking step.

    Returns fn(states, imgs [S, N, H, W], keys [S, N], active [S, N], mask)
    -> (states, infos), with every argument and result sharded over `axis`.
    """
    step = partial(slam_step_batch, cam=cam, cfg=cfg, frontend=frontend)

    def stepped(states, imgs, keys, active, mask):
        return jax.vmap(
            lambda st, im, ke, ac: step(st, im, ke, ac, mask)
        )(states, imgs, keys, active)

    sh = seq_sharding(mesh, axis)
    # A single sharding acts as a pytree prefix: every leaf of the states /
    # infos pytrees gets its leading axis placed on `axis`.
    return jax.jit(
        stepped,
        in_shardings=(sh, sh, sh, sh, None),
        out_shardings=(sh, sh),
    )


class MultiSlam:
    """Host driver for S concurrent sequences on one mesh (deployment shape).

    Mirrors the single-sequence Slam driver (slam/pipeline.py) but steps all
    sequences in lockstep batched dispatches. Initialization runs per
    sequence on the single-chip path (it is control-flow heavy and happens
    once), then states are stacked and sharded.

    When the mesh has an 'lm' axis, `refine_every > 0` runs a periodic
    landmark-sharded FULL bundle adjustment over every sequence's live map
    (parallel/refine.py) — the global-optimization stage the reference's
    single-process Ceres never had (its per-commit BA freezes all previous
    keyframes, src/Slam.cpp:202-213), and the job of the mesh's 'lm' axis.
    """

    def __init__(
        self,
        cam: Camera,
        videos: list,
        mesh: Mesh,
        config: SlamConfig = SlamConfig(),
        static_mask: np.ndarray | None = None,
        seed: int = 0,
        frontend=None,
        refine_every: int = 0,
        refine_iters: int = 10,
    ):
        from ..slam.frontend import ClassicalFrontend
        from ..slam.pipeline import Slam

        self.mesh = mesh
        self.cam = cam
        self.cfg = config
        S = len(videos)
        if S % mesh.shape["seq"] != 0:
            raise ValueError(
                f"{S} sequences not divisible by seq axis {mesh.shape['seq']}"
            )
        self._slams = [
            Slam(cam, v, config, static_mask=static_mask, seed=seed + i,
                 frontend=frontend)
            for i, v in enumerate(videos)
        ]
        self.frontend = self._slams[0].frontend
        self._key = jax.random.PRNGKey(seed ^ 0x5EED)
        self._step = multi_sequence_step(
            mesh, cam=cam, cfg=config, frontend=self.frontend
        )
        self._mask = None if static_mask is None else jnp.asarray(static_mask)
        self.states: SlamState | None = None
        # Per-sequence failure detection / recovery (parity with the
        # single-sequence driver's reinit_on_lost; Slam._check_batch).
        self._lost_streak = np.zeros(S, np.int64)
        self.segments: list = []
        self.refine_every = refine_every
        self._refine = None
        self.refine_costs: list = []
        if refine_every:
            if "lm" not in mesh.axis_names:
                raise ValueError("refine_every needs an 'lm' mesh axis")
            from .refine import make_refine_step

            # The matcher reads the cached obs_desc, which refinement leaves
            # stale only in VALUE (descriptors never change — only poses and
            # points move), so no refresh is needed.
            self._refine = make_refine_step(
                cam, mesh, max_iters=refine_iters,
            )

    def initialize(self) -> bool:
        ok = all(s.initialize() for s in self._slams)
        if not ok:
            return False
        self.states = shard_states(
            jax.tree.map(lambda *xs: jnp.stack(xs), *[s.state for s in self._slams]),
            self.mesh,
        )
        return True

    def run_batched(self, max_frames: int | None = None, batch: int = 16) -> int:
        """Step every sequence `batch` frames per dispatch until all EOF."""
        assert self.states is not None, "call initialize() first"
        S = len(self._slams)
        total = 0
        batches = 0
        sh = seq_sharding(self.mesh)
        while max_frames is None or total < max_frames:
            want = batch if max_frames is None else min(batch, max_frames - total)
            frames = [s._decode_batch(want) for s in self._slams]
            ns = [len(f) for f in frames]
            n = max(ns)
            if n == 0:
                break
            H, W = self.cam.height, self.cam.width
            imgs = np.zeros((S, batch, H, W), np.uint8)
            active = np.zeros((S, batch), bool)
            for i, fl in enumerate(frames):
                for j, f in enumerate(fl):
                    imgs[i, j] = f
                    active[i, j] = True
            self._key, k = jax.random.split(self._key)
            keys = jax.random.split(k, S * batch).reshape(S, batch, -1)
            self.states, infos = self._step(
                self.states,
                put_sharded(imgs, sh),
                put_sharded(keys, sh),
                put_sharded(active, sh),
                self._mask,
            )
            total += n
            batches += 1
            if self.cfg.reinit_on_lost and batches % max(
                1, self.cfg.lost_check_interval
            ) == 0:
                self._check_lost(infos, ns)
            if self._refine is not None and batches % self.refine_every == 0:
                self.states, cost = self._refine(self.states)
                self.refine_costs.append(cost)
        return total

    # -- failure detection / recovery ---------------------------------------
    def _check_lost(self, infos, ns: list[int]) -> None:
        """Declare a sequence lost after `lost_patience` consecutive
        low-match frames (same rule as Slam._check_batch), archive its
        finished segment, and re-bootstrap it from its current stream
        position — the other sequences keep tracking undisturbed."""
        counts = np.asarray(infos.n_matches_total)  # [S, batch]
        for i in range(len(self._slams)):
            if ns[i] == 0:
                continue
            run = int(self._lost_streak[i])
            for c in counts[i, : ns[i]]:
                run = run + 1 if c < self.cfg.min_track_matches else 0
            self._lost_streak[i] = run
            if run >= self.cfg.lost_patience:
                self._reinit_sequence(i)

    def _reinit_sequence(self, i: int) -> None:
        s = self._slams[i]
        # Pull this sequence's row to the host, archive the segment, then
        # re-run the two-view bootstrap on the single-chip path (it consumes
        # frames from the same per-sequence decoder run_batched feeds from).
        s.state = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)[i]), self.states
        )
        self.segments.append(
            dict(
                seq=i,
                poses=s.poses(),
                frame_indices=s.keyframe_indices(),
                points=s.points(),
            )
        )
        K = s.state.last_feat.xy.shape[0]
        s.state = SlamState.create(
            F=self.cfg.max_keyframes,
            P=self.cfg.map_capacity,
            O=self.cfg.max_observations,
            K=K,
            D=self.frontend.descriptor_dim,
        )
        self._lost_streak[i] = 0
        if not s.initialize():
            return  # EOF during re-bootstrap: the sequence is done
        self.states = shard_states(
            jax.tree.map(
                lambda big, one: big.at[i].set(one), self.states, s.state
            ),
            self.mesh,
        )

    def refine_map(self):
        """Run one landmark-sharded full-map BA over all sequences now."""
        assert self._refine is not None, "construct with refine_every > 0"
        self.states, cost = self._refine(self.states)
        self.refine_costs.append(cost)
        return cost

    def states_per_sequence(self) -> list[SlamState]:
        return [
            jax.tree.map(lambda x: np.asarray(x)[i], self.states)
            for i in range(len(self._slams))
        ]
