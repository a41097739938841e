"""Sphere tracing through a learned SDF — TPU-native masked fixed-shape design.

Re-implements the reference RayTracing module (model/ray_tracing.py:6-337)
with the same numerics but restructured for XLA:

  * The reference's data-dependent while-loops with boolean fancy-indexing
    become `lax.while_loop`s over ALL rays with live-masks — dense masked
    compute beats dynamic gathers on TPU (SURVEY.md §7.4).
  * Each bidirectional trace iteration evaluates the SDF once on the
    concatenated (start, end) points: one large MXU matmul instead of two.
  * The back-stepping line search (ray_tracing.py:173-188) is an inner
    `lax.while_loop` whose condition is data-dependent, so it costs zero SDF
    evaluations when no ray crossed the surface.
  * The 100-step fallback sampler (ray_tracing.py:195-257) and the min-SDF
    miss handler (:309-337) support an optional fixed "budget": rays needing
    the expensive path are compacted to a static-size batch via one argsort
    (unfinished-first), processed, and scattered back — static shapes, no
    recompilation, and the 100x SDF-eval blowup only applies to the budgeted
    subset. `budget=None` processes every ray densely (exact reference
    semantics).

The SDF is a closure `sdf_fn(pts [P,3]) -> [P]` — explicit function argument
rather than a module back-reference, which keeps the model<->shader cycle
jittable (SURVEY.md §7.4 item 3).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from nefii_tpu.utils.camera import get_sphere_intersection


def eval_chunked(sdf_fn: Callable, pts: jnp.ndarray, chunk: Optional[int]) -> jnp.ndarray:
    """Evaluate sdf_fn over [P,3] points, optionally in fixed-size chunks.

    Mirrors the reference's 100k-point batching (ray_tracing.py:26-27,214) to
    bound peak memory; uses lax.map so the chunk loop is compiled, not Python.
    """
    P = pts.shape[0]
    if not chunk or P <= chunk:
        return sdf_fn(pts)
    n_chunks = -(-P // chunk)
    pad = n_chunks * chunk - P
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)))
    out = jax.lax.map(sdf_fn, pts_p.reshape(n_chunks, chunk, 3))
    return out.reshape(-1)[:P]


class TraceResult(NamedTuple):
    points: jnp.ndarray        # [N, 3] surface (or fallback) points
    object_mask: jnp.ndarray   # [N] bool — network thinks the ray hit
    dists: jnp.ndarray         # [N] distance along the ray
    n_evals: Any = 0  # SDF point-evaluations actually executed (traced i32)
    # rays that NEEDED a budgeted fallback path but were dropped by the
    # compaction (traced i32). Nonzero counts mean the budget silently
    # degraded those rays to defaults — results are exact iff both are 0.
    sampler_overflow: Any = 0
    minsdf_overflow: Any = 0
    # bracketed sign-change rays the rootfind compaction left un-iterated
    # (they keep the 0-step prediction; exact iff 0)
    rootfind_overflow: Any = 0
    # live rays the mid-trace compaction could not fit in compact_budget:
    # they stop iterating at compact_after and fall through to the sampler
    # (still counted — results are exact iff 0)
    trace_overflow: Any = 0
    # Demand counters (only populated when RayTracer.measure_demand): the
    # number of rays each budgeted path WOULD need, measured pre-budget.
    # demand <= budget  <=>  the corresponding overflow is 0, so one dense
    # probe with measure_demand=True yields exact budget sizes for a scene
    # (scripts/render.py --auto_budget, models/budgets.py). Python-int 0
    # when off, so default compiled programs are unchanged.
    sampler_demand: Any = 0    # rays needing the 100-step fallback sampler
    minsdf_demand: Any = 0     # rays needing the min-SDF miss handler
    rootfind_demand: Any = 0   # bracketed (net_surface) rays for the rootfind
    trace_demand: Any = 0      # rays still live at iteration compact_after


@dataclass(frozen=True)
class RayTracer:
    object_bounding_sphere: float = 1.0
    sdf_threshold: float = 5.0e-5
    line_search_step: float = 0.5
    line_step_iters: int = 1
    sphere_tracing_iters: int = 10
    n_steps: int = 100
    n_rootfind_steps: int = 8
    sdf_chunk: int = 100_000
    sampler_budget: Optional[int] = None   # static cap on rays taking the 100-step path
    minsdf_budget: Optional[int] = None    # static cap on rays taking the min-SDF path
    rootfind_method: str = "bisection"     # "bisection" | "secant" (reference :259-307)
    # static cap on rays ITERATING the rootfind: only rays with a bracketed
    # sign change (sdf_low>0 & sdf_high<0) advance past the 0-step
    # prediction — the rootfind's while-loop body is masked for everyone
    # else — so gathering the bracketed rays into this budget and scattering
    # the refined roots back over the dense 0-step prediction is EXACT while
    # the budget covers the bracketed count (overflow counted).
    rootfind_budget: Optional[int] = None
    # Mid-trace live-ray compaction: the dense masked trace evaluates the SDF
    # on ALL rays every iteration even after most converge (live fraction
    # measured ~20-30% after 2 iterations on trained geometry). With both set,
    # iterations [0, compact_after) run dense over all N rays, then the still-
    # live rays are gathered (live-first argsort) into a [compact_budget]
    # batch for the remaining iterations and scattered back. Exact whenever
    # the live count fits the budget; overflow rays stop at their phase-1
    # state, flow to the fallback sampler, and are COUNTED (trace_overflow).
    compact_after: Optional[int] = None
    compact_budget: Optional[int] = None
    # Populate TraceResult's *_demand counters (a handful of extra masked
    # sums; default off so production programs — and their compile-cache
    # entries — are byte-identical). trace_demand additionally needs
    # compact_after set: the dense trace is split at that iteration (a
    # semantics-preserving phase split) to count the live rays there.
    measure_demand: bool = False

    # ------------------------------------------------------------------
    def __call__(
        self,
        sdf_fn: Callable,
        cam_loc: jnp.ndarray,          # [B, 3]
        object_mask: jnp.ndarray,      # [B*S] bool
        ray_directions: jnp.ndarray,   # [B, S, 3]
        key: Optional[jax.Array] = None,
        training: bool = False,
        sphere_trace_fn: Optional[Callable] = None,
    ) -> TraceResult:
        B, S, _ = ray_directions.shape
        N = B * S

        sphere_intersections, mask_intersect = get_sphere_intersection(
            cam_loc, ray_directions, r=self.object_bounding_sphere
        )
        # flatten to per-ray arrays
        cam = jnp.broadcast_to(cam_loc[:, None, :], (B, S, 3)).reshape(N, 3)
        dirs = ray_directions.reshape(N, 3)
        near = sphere_intersections[..., 0].reshape(N)
        far = sphere_intersections[..., 1].reshape(N)
        mask_intersect = mask_intersect.reshape(N)
        object_mask = object_mask.reshape(N)

        # sphere_trace_fn: optional fused whole-trace kernel with the 6-output
        # contract of the dense trace (ops/pallas/fused_trace.py); the
        # fallback sampler / min-SDF paths below still use sdf_fn. Mid-trace
        # compaction applies only to the jnp trace (the kernel already skips
        # converged rays in-kernel).
        if sphere_trace_fn is not None:
            (acc_start, acc_end, unfinished_start, min_dis, max_dis,
             n_evals) = sphere_trace_fn(cam, dirs, mask_intersect, near, far)
            trace_overflow = jnp.int32(0)
            trace_demand = 0
        else:
            (acc_start, acc_end, unfinished_start, min_dis, max_dis, n_evals,
             trace_overflow, trace_demand) = self._sphere_trace(
                sdf_fn, cam, dirs, mask_intersect, near, far
            )

        network_object_mask = acc_start < acc_end
        dists = acc_start
        sampler_mask = unfinished_start

        # fallback sampler for rays the tracer did not converge on
        (sampler_pts, sampler_obj, sampler_dists, sampler_evals,
         sampler_overflow, rootfind_overflow, sampler_demand,
         rootfind_demand) = self._ray_sampler(
            sdf_fn, cam, dirs, object_mask, acc_start, acc_end, sampler_mask, training
        )
        n_evals = n_evals + sampler_evals
        dists = jnp.where(sampler_mask, sampler_dists, dists)
        network_object_mask = jnp.where(sampler_mask, sampler_obj, network_object_mask)

        points = cam + dists[:, None] * dirs

        if not training:
            return TraceResult(
                points, network_object_mask, dists, n_evals, sampler_overflow,
                trace_overflow=trace_overflow,
                rootfind_overflow=rootfind_overflow,
                sampler_demand=sampler_demand,
                rootfind_demand=rootfind_demand,
                trace_demand=trace_demand,
            )

        # ---- training extras: min-SDF points for the mask loss -------------
        in_mask = (~network_object_mask) & object_mask & (~sampler_mask)
        out_mask = (~object_mask) & (~sampler_mask)

        # rays that never met the bounding sphere: project origin onto the ray
        mask_left_out = (in_mask | out_mask) & (~mask_intersect)
        proj_dis = -jnp.einsum("nj,nj->n", dirs, cam)
        dists = jnp.where(mask_left_out, proj_dis, dists)

        # rays inside the sphere that missed (or object-mask conflicts):
        # take the point of minimal SDF along the ray
        mask = (in_mask | out_mask) & mask_intersect
        min_dis = jnp.where(network_object_mask & out_mask, acc_start, min_dis)
        if key is None:
            key = jax.random.PRNGKey(0)
        (min_pts_dist, minsdf_evals, minsdf_overflow,
         minsdf_demand) = self._minimal_sdf_points(
            sdf_fn, cam, dirs, min_dis, max_dis, mask, key
        )
        n_evals = n_evals + minsdf_evals
        dists = jnp.where(mask, min_pts_dist, dists)

        points = cam + dists[:, None] * dirs
        return TraceResult(
            points, network_object_mask, dists, n_evals,
            sampler_overflow, minsdf_overflow, rootfind_overflow,
            trace_overflow,
            sampler_demand=sampler_demand, minsdf_demand=minsdf_demand,
            rootfind_demand=rootfind_demand, trace_demand=trace_demand,
        )

    # ------------------------------------------------------------------
    def _trace_phase(self, sdf_fn, cam, dirs, state, max_iter):
        """Run bidirectional trace iterations on `state` until `max_iter`.

        state = (it, curr_s, curr_e, unf_s, unf_e, acc_s, acc_e, n_ev); every
        per-ray entry matches cam/dirs' leading dim, so the same loop serves
        both the dense phase and the compacted live-ray phase.
        """
        N = cam.shape[0]
        thresh = self.sdf_threshold

        def masked_sdf_both(acc_s, acc_e, m_s, m_e):
            pts = jnp.concatenate(
                [cam + acc_s[:, None] * dirs, cam + acc_e[:, None] * dirs], axis=0
            )
            sd = eval_chunked(sdf_fn, pts, self.sdf_chunk)
            return jnp.where(m_s, sd[:N], 0.0), jnp.where(m_e, sd[N:], 0.0)

        def head(unf_s, unf_e, next_s, next_e):
            curr_s = jnp.where(unf_s, next_s, 0.0)
            curr_s = jnp.where(curr_s <= thresh, 0.0, curr_s)
            curr_e = jnp.where(unf_e, next_e, 0.0)
            curr_e = jnp.where(curr_e <= thresh, 0.0, curr_e)
            return curr_s, curr_e, unf_s & (curr_s > thresh), unf_e & (curr_e > thresh)

        def cond(state):
            it, curr_s, curr_e, unf_s, unf_e, *_ = state
            return (jnp.any(unf_s) | jnp.any(unf_e)) & (it < max_iter)

        def body(state):
            it, curr_s, curr_e, unf_s, unf_e, acc_s, acc_e, n_ev = state
            acc_s = acc_s + curr_s
            acc_e = acc_e - curr_e
            next_s, next_e = masked_sdf_both(acc_s, acc_e, unf_s, unf_e)
            n_ev = n_ev + 2 * N

            # back-step line search for rays that crossed the surface
            def ls_cond(c):
                j, next_s, next_e, _, _, _ = c
                return (jnp.any(next_s < 0) | jnp.any(next_e < 0)) & (
                    j < self.line_step_iters
                )

            def ls_body(c):
                j, next_s, next_e, acc_s, acc_e, n_ev = c
                np_s = next_s < 0
                np_e = next_e < 0
                factor = (1.0 - self.line_search_step) * jnp.exp2(-j.astype(jnp.float32))
                acc_s = jnp.where(np_s, acc_s - factor * curr_s, acc_s)
                acc_e = jnp.where(np_e, acc_e + factor * curr_e, acc_e)
                sd_s, sd_e = masked_sdf_both(acc_s, acc_e, np_s, np_e)
                next_s = jnp.where(np_s, sd_s, next_s)
                next_e = jnp.where(np_e, sd_e, next_e)
                return j + 1, next_s, next_e, acc_s, acc_e, n_ev + 2 * N

            _, next_s, next_e, acc_s, acc_e, n_ev = jax.lax.while_loop(
                ls_cond, ls_body, (jnp.int32(0), next_s, next_e, acc_s, acc_e, n_ev)
            )

            not_crossed = acc_s < acc_e
            unf_s = unf_s & not_crossed
            unf_e = unf_e & not_crossed
            curr_s, curr_e, unf_s, unf_e = head(unf_s, unf_e, next_s, next_e)
            return it + 1, curr_s, curr_e, unf_s, unf_e, acc_s, acc_e, n_ev

        return jax.lax.while_loop(cond, body, state)

    def _sphere_trace(self, sdf_fn, cam, dirs, mask_intersect, near, far):
        """Bidirectional sphere tracing (reference ray_tracing.py:104-193).

        With compact_after/compact_budget set, iterations are split into a
        dense phase over all rays and a compacted phase over the still-live
        subset (see the dataclass field comment); results are identical to
        the dense trace whenever the live count fits the budget, and the
        shortfall is counted in the returned overflow."""
        N = cam.shape[0]
        T = self.sphere_tracing_iters

        acc_start = jnp.where(mask_intersect, near, 0.0)
        acc_end = jnp.where(mask_intersect, far, 0.0)
        min_dis, max_dis = acc_start, acc_end

        unf_s = mask_intersect
        unf_e = mask_intersect

        compact = (
            self.compact_after is not None
            and self.compact_budget is not None
            and self.compact_budget < N
            and self.compact_after < T
        )
        # measure mode: split the DENSE trace at compact_after purely to
        # count the live rays there (the phase split is a semantic identity:
        # the second _trace_phase resumes from the carried state), so a
        # probe can size compact_budget without compaction being active
        measure = (
            self.measure_demand
            and not compact
            and self.compact_after is not None
            and self.compact_after < T
        )
        k1 = self.compact_after if (compact or measure) else T

        # initial SDF eval + head
        thresh = self.sdf_threshold
        pts0 = jnp.concatenate(
            [cam + acc_start[:, None] * dirs, cam + acc_end[:, None] * dirs],
            axis=0,
        )
        sd0 = eval_chunked(sdf_fn, pts0, self.sdf_chunk)
        next_s = jnp.where(unf_s, sd0[:N], 0.0)
        next_e = jnp.where(unf_e, sd0[N:], 0.0)
        curr_s = jnp.where(unf_s, next_s, 0.0)
        curr_s = jnp.where(curr_s <= thresh, 0.0, curr_s)
        curr_e = jnp.where(unf_e, next_e, 0.0)
        curr_e = jnp.where(curr_e <= thresh, 0.0, curr_e)
        state = (
            jnp.int32(0), curr_s, curr_e,
            unf_s & (curr_s > thresh), unf_e & (curr_e > thresh),
            acc_start, acc_end, jnp.int32(2 * N),
        )

        state = self._trace_phase(sdf_fn, cam, dirs, state, k1)
        it, curr_s, curr_e, unf_s, unf_e, acc_s, acc_e, n_evals = state

        if measure:
            demand = (unf_s | unf_e).sum().astype(jnp.int32)
            state = self._trace_phase(sdf_fn, cam, dirs, state, T)
            _, _, _, unf_s, unf_e, acc_s, acc_e, n_evals = state
            return (acc_s, acc_e, unf_s, min_dis, max_dis, n_evals,
                    jnp.int32(0), demand)
        if not compact:
            return (acc_s, acc_e, unf_s, min_dis, max_dis, n_evals,
                    jnp.int32(0), 0)

        # ---- compacted phase: gather still-live rays, iterate, scatter ----
        M = self.compact_budget
        live = unf_s | unf_e
        live_count = live.sum().astype(jnp.int32)
        overflow = jnp.maximum(live_count - M, 0)
        order = jnp.argsort(~live, stable=True)
        sel = order[:M]

        sub_state = (
            it, curr_s[sel], curr_e[sel], unf_s[sel], unf_e[sel],
            acc_s[sel], acc_e[sel], n_evals,
        )
        sub_state = self._trace_phase(sdf_fn, cam[sel], dirs[sel], sub_state, T)
        _, _, _, sub_unf_s, sub_unf_e, sub_acc_s, sub_acc_e, n_evals = sub_state

        # overflow rays keep their phase-1 state (still unfinished -> they
        # fall through to the sampler, like rays the dense trace never
        # converged on); compacted rays get their phase-2 results
        acc_s = acc_s.at[sel].set(sub_acc_s)
        acc_e = acc_e.at[sel].set(sub_acc_e)
        unf_s = unf_s.at[sel].set(sub_unf_s)
        unf_e = unf_e.at[sel].set(sub_unf_e)
        return (acc_s, acc_e, unf_s, min_dis, max_dis, n_evals, overflow,
                live_count if self.measure_demand else 0)

    # ------------------------------------------------------------------
    def _ray_sampler(
        self, sdf_fn, cam, dirs, object_mask, acc_start, acc_end, sampler_mask, training
    ):
        """100-step sign-change sampler + bisection (ray_tracing.py:195-280).

        With `sampler_budget` set, only a compacted fixed-size subset of rays
        (unfinished first) takes the expensive 100-step evaluation; overflow
        rays fall back to non-hit.
        """
        N = cam.shape[0]
        budget = self.sampler_budget
        demand = (sampler_mask.sum().astype(jnp.int32)
                  if self.measure_demand else 0)
        if budget is None or budget >= N:
            res = self._ray_sampler_dense(
                sdf_fn, cam, dirs, object_mask, acc_start, acc_end, sampler_mask, training
            )
            return res[:4] + (jnp.int32(0), res[4], demand, res[5])

        # compact: stable argsort with unfinished rays first
        order = jnp.argsort(~sampler_mask, stable=True)
        sel = order[:budget]
        overflow = jnp.maximum(
            sampler_mask.sum().astype(jnp.int32) - budget, 0
        )
        pts, obj, dist, n_ev, rf_overflow, rf_demand = self._ray_sampler_dense(
            sdf_fn,
            cam[sel],
            dirs[sel],
            object_mask[sel],
            acc_start[sel],
            acc_end[sel],
            sampler_mask[sel],
            training,
        )
        # overflow rays beyond the budget: treated as non-hit, keep tracer dists
        full_pts = cam + acc_start[:, None] * dirs
        full_obj = jnp.zeros((N,), bool)
        full_dist = acc_start
        full_pts = full_pts.at[sel].set(pts)
        full_obj = full_obj.at[sel].set(obj)
        full_dist = full_dist.at[sel].set(dist)
        return (full_pts, full_obj, full_dist, n_ev, overflow, rf_overflow,
                demand, rf_demand)

    def _ray_sampler_dense(
        self, sdf_fn, cam, dirs, object_mask, acc_start, acc_end, sampler_mask, training
    ):
        N = cam.shape[0]
        n = self.n_steps

        intervals = jnp.linspace(0.0, 1.0, n)[None, :]  # [1, n]
        pts_intervals = acc_start[:, None] + intervals * (acc_end - acc_start)[:, None]
        points = cam[:, None, :] + pts_intervals[..., None] * dirs[:, None, :]  # [N,n,3]

        sdf_val = eval_chunked(sdf_fn, points.reshape(-1, 3), self.sdf_chunk).reshape(N, n)

        # first sign flip: sign * descending-arange forces argmin to the first min
        tmp = jnp.sign(sdf_val) * jnp.arange(n, 0, -1, dtype=sdf_val.dtype)[None, :]
        idx = jnp.argmin(tmp, axis=-1)  # [N]

        take = lambda arr, i: jnp.take_along_axis(arr, i[:, None], axis=1)[:, 0]
        sampler_dists = take(pts_intervals, idx)
        sdf_at_idx = take(sdf_val, idx)

        net_surface = sdf_at_idx < 0
        true_surface = object_mask

        # non-surface rays: take the point of minimal SDF value instead
        out_idx = jnp.argmin(sdf_val, axis=-1)
        p_out = ~(true_surface & net_surface)
        sampler_dists = jnp.where(p_out, take(pts_intervals, out_idx), sampler_dists)

        sampler_net_obj_mask = sampler_mask & net_surface

        # bisection root-find on rays with a bracketed sign change
        rootfind_pts = (net_surface & true_surface) if training else net_surface
        # torch's x[idx-1] wraps at idx==0 — replicate with a mod
        prev = (idx - 1) % n
        z_high = take(pts_intervals, idx)
        sdf_high = sdf_at_idx
        z_low = take(pts_intervals, prev)
        sdf_low = take(sdf_val, prev)
        rf = self._secant if self.rootfind_method == "secant" else self._bisection
        rf_budget = self.rootfind_budget
        rootfind_overflow = jnp.int32(0)
        rootfind_demand = (net_surface.sum().astype(jnp.int32)
                           if self.measure_demand else 0)
        if rf_budget is not None and rf_budget < N:
            # Compact the rootfind to the net_surface rays. Only their z is
            # ever consumed (rootfind_pts is a subset of net_surface), and
            # net_surface contains every `work` ray driving the loop's
            # global any(work) condition, so the subset runs the SAME number
            # of iterations and each selected ray's per-iteration updates
            # (own z_mid / own sdf_mid) are unchanged — bit-exact while the
            # budget covers the net_surface count. Overflow rays keep the
            # 0-step prediction and are counted.
            order = jnp.argsort(~net_surface, stable=True)
            sel = order[:rf_budget]
            rootfind_overflow = jnp.maximum(
                net_surface.sum().astype(jnp.int32) - rf_budget, 0
            )
            z_sub, bisect_evals = rf(
                sdf_fn, sdf_low[sel], sdf_high[sel], z_low[sel], z_high[sel],
                cam[sel], dirs[sel],
            )
            if self.rootfind_method == "secant":
                eps = 1e-8
                z0 = -sdf_low * (z_high - z_low) / (sdf_high - sdf_low + eps) + z_low
                z0 = jnp.clip(z0, 0.0, 2e1)
            else:
                z0 = (z_low + z_high) / 2.0
            z_pred = z0.at[sel].set(z_sub)
        else:
            z_pred, bisect_evals = rf(
                sdf_fn, sdf_low, sdf_high, z_low, z_high, cam, dirs
            )
        sampler_dists = jnp.where(rootfind_pts, z_pred, sampler_dists)

        sampler_pts = cam + sampler_dists[:, None] * dirs
        n_ev = jnp.int32(N * n) + bisect_evals
        return (sampler_pts, sampler_net_obj_mask, sampler_dists, n_ev,
                rootfind_overflow, rootfind_demand)

    def _bisection(self, sdf_fn, sdf_low, sdf_high, z_low, z_high, cam, dirs):
        """Masked bisection (reference `rootfind`, ray_tracing.py:259-280)."""
        work = (sdf_low > 0) & (sdf_high < 0) & (z_high > z_low)
        z_mid = (z_low + z_high) / 2.0

        def cond(state):
            i, work, *_ = state
            return jnp.any(work) & (i < self.n_rootfind_steps)

        def body(state):
            i, work, z_low, z_high, z_mid = state
            p_mid = cam + z_mid[:, None] * dirs
            sdf_mid = eval_chunked(sdf_fn, p_mid, self.sdf_chunk)
            ind_low = sdf_mid > 0
            z_low = jnp.where(ind_low, z_mid, z_low)
            z_high = jnp.where(~ind_low, z_mid, z_high)
            z_mid = (z_low + z_high) / 2.0
            work = work & ((z_high - z_low) > 1e-6)
            return i + 1, work, z_low, z_high, z_mid

        iters, _, _, _, z_mid = jax.lax.while_loop(
            cond, body, (jnp.int32(0), work, z_low, z_high, z_mid)
        )
        return z_mid, iters * jnp.int32(cam.shape[0])

    def _secant(self, sdf_fn, sdf_low, sdf_high, z_low, z_high, cam, dirs):
        """Masked secant root-find (reference `secant`, ray_tracing.py:282-307)."""
        eps = 1e-8
        work = (sdf_low > 0) & (sdf_high < 0) & (z_high > z_low)

        def predict(sdf_low, sdf_high, z_low, z_high):
            z = -sdf_low * (z_high - z_low) / (sdf_high - sdf_low + eps) + z_low
            return jnp.clip(z, 0.0, 2e1)

        z_pred = predict(sdf_low, sdf_high, z_low, z_high)

        def cond(state):
            i, work, *_ = state
            return jnp.any(work) & (i < self.n_rootfind_steps)

        def body(state):
            i, work, sdf_low, sdf_high, z_low, z_high, z_pred = state
            p = cam + z_pred[:, None] * dirs
            sdf_mid = eval_chunked(sdf_fn, p, self.sdf_chunk)
            ind_low = sdf_mid > 0
            ind_high = sdf_mid < 0
            z_low = jnp.where(ind_low, z_pred, z_low)
            sdf_low = jnp.where(ind_low, sdf_mid, sdf_low)
            z_high = jnp.where(ind_high, z_pred, z_high)
            sdf_high = jnp.where(ind_high, sdf_mid, sdf_high)
            z_pred = predict(sdf_low, sdf_high, z_low, z_high)
            work = work & ((z_high - z_low) > 1e-6)
            return i + 1, work, sdf_low, sdf_high, z_low, z_high, z_pred

        iters, _, _, _, _, _, z_pred = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), work, sdf_low, sdf_high, z_low, z_high, z_pred),
        )
        return z_pred, iters * jnp.int32(cam.shape[0])

    # ------------------------------------------------------------------
    def _minimal_sdf_points(self, sdf_fn, cam, dirs, min_dis, max_dis, mask, key):
        """Min-SDF point along miss rays (reference ray_tracing.py:309-337)."""
        N = cam.shape[0]
        budget = self.minsdf_budget
        n = self.n_steps
        # one shared random [n] vector scaled per ray, as in the reference
        steps01 = jax.random.uniform(key, (n,))

        def dense(cam_, dirs_, min_d, max_d):
            steps = steps01[None, :] * (max_d - min_d)[:, None] + min_d[:, None]
            pts = cam_[:, None, :] + steps[..., None] * dirs_[:, None, :]
            sd = eval_chunked(sdf_fn, pts.reshape(-1, 3), self.sdf_chunk).reshape(-1, n)
            mi = jnp.argmin(sd, axis=-1)
            return jnp.take_along_axis(steps, mi[:, None], axis=1)[:, 0]

        demand = mask.sum().astype(jnp.int32) if self.measure_demand else 0
        if budget is None or budget >= N:
            return (dense(cam, dirs, min_dis, max_dis), jnp.int32(N * n),
                    jnp.int32(0), demand)

        order = jnp.argsort(~mask, stable=True)
        sel = order[:budget]
        overflow = jnp.maximum(mask.sum().astype(jnp.int32) - budget, 0)
        d = dense(cam[sel], dirs[sel], min_dis[sel], max_dis[sel])
        out = min_dis  # fallback for overflow rays
        return out.at[sel].set(d), jnp.int32(budget * n), overflow, demand
