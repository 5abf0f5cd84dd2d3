"""Typed configuration objects.

Field names and default values mirror the reference YAML schemas so that the
reference configs port verbatim:
  * controller params — /root/reference/config/params_controller.yaml:1-12,
    loaded at /root/reference/src/whole_body_controller.cpp:122-148
  * planner params — /root/reference/config/params_planner.yaml:1-8,
    loaded at /root/reference/src/motion_planner.cpp:99-120
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

GRAVITY = 9.81  # reference: gravityAcceleration, whole_body_controller.hpp:30
# "infinity" for one-sided QP bounds — finite, the qpOASES INFTY convention
# (reference cpp:508-514); keeps every gradient path NaN-free under jit
QP_INF = 1.0e20

NUM_JOINTS = 12
NUM_LEGS = 4
NV = 6 + NUM_JOINTS  # floating-base velocity dimension (18)
# QP decision vector: [com accel (6); joint accel (12); GRFs (12); slacks (12)]
# reference: whole_body_controller.hpp:31
QP_NUM_VARS = 6 + NUM_JOINTS + 3 * NUM_LEGS + 3 * NUM_LEGS  # 42
# QP constraint rows: dynamics (6) + stance feet (12) + friction (16)
# + torque limits (12) + swing tracking (24) — whole_body_controller.hpp:32
QP_NUM_CONSTRAINTS = 6 + 3 * NUM_LEGS + 4 * NUM_LEGS + NUM_JOINTS + 6 * NUM_LEGS  # 70

# Leg order used everywhere (jacobian stacking, contact flags, reference msg):
# reference src/whole_body_controller.cpp:327-341
LEG_NAMES = ("LH", "LF", "RF", "RH")


@dataclasses.dataclass(frozen=True)
class ControllerParams:
    """WBC gains/limits (reference config/params_controller.yaml)."""

    friction: float = 1.0
    loop_rate: float = 400.0
    max_torque: float = 80.0
    kp: float = 6000.0          # reference: kpValue
    kp_z: float = 10000.0       # reference: kpValueZ
    kd: float = 1800.0          # reference: kdValue
    ki: float = 0.0             # reference: kiValue
    kp_swing: float = 250.0     # reference: kpSwingValue
    kd_swing: float = 20.0      # reference: kdSwingValue
    slack_weight: float = 1000.0
    initial_reference_pose: Sequence[float] = (0.0, 0.0, 0.50, 0.0, 0.0, 0.0)
    # beyond-reference option: analytic Tdot/Jdot via jvp instead of the
    # reference's finite differences (cpp:384-402) — no one-cycle lag, no
    # contact-switch transients
    exact_derivatives: bool = False
    # exact_derivatives implementation on the pallas setup path:
    # False (default) = the tangent propagation runs INSIDE the fused
    # setup kernel (ops/pallas/setup_kernel exact_mode — the round-4
    # answer to the +7.9 ms XLA jvp epilogue); True = force the XLA jvp
    # epilogue (control/wbc._exact_epilogue_batched), kept as the
    # independent oracle for A/B and equivalence tests
    exact_epilogue: bool = False

    @property
    def dt(self) -> float:
        return 1.0 / self.loop_rate


@dataclasses.dataclass(frozen=True)
class PlannerParams:
    """Static-walk gait parameters (reference config/params_planner.yaml)."""

    step_length: float = 0.1
    height_control_point: float = 0.1
    x_offset: float = 0.50
    y_offset: float = 0.33
    step_duration: float = 0.2
    body_height: float = 0.50
    body_final_velocity: float = 0.40
    dt: float = 0.01

    @property
    def cycle_duration(self) -> float:
        # reference src/motion_planner.cpp:119
        return 4.0 * self.step_duration


@dataclasses.dataclass(frozen=True)
class QPSolverParams:
    """Batched OSQP-style ADMM solver settings (replaces qpOASES SQProblem

    hot-started active-set solves, reference whole_body_controller.cpp:517-533).

    Defaults tuned on-chip (tools/tune_qp.py + tools/tune_sweep.py): vs the
    conservative (100-iteration, 10-Ruiz, 8-warm-NS, 2-refine) setting they
    are 1.6x faster AND ~700x better on walking-sweep mean relative KKT —
    the third refinement pass does the accuracy work that longer NS loops
    and more ADMM iterations were paying for.
    """

    iterations: int = 40          # ADMM iterations per hot-started solve
                                  # (round-5 tuning, post P-free kernel:
                                  # 40 is 7.5% faster than 60 at walking
                                  # max KKT 2.3e-3 vs 1.9e-3 — both inside
                                  # the accepted 2.6e-3 envelope)
    cold_iterations: int = 200    # ADMM iterations when the warm start is
                                  # all-zero (the qpOASES init-vs-hotstart
                                  # asymmetry: nWSR=100 on init, cheap after
                                  # — reference cpp:523-533); a correct
                                  # active-set estimate from scratch needs
                                  # ~3x the hot-start iteration budget
    rho: float = 0.5              # base ADMM penalty (tuned on the WBC QP)
    rho_eq_scale: float = 1000.0  # penalty boost for equality rows
    sigma: float = 0.0            # proximal weight; 0 selects the
                                  # constraint-space (z,y) ADMM kernel —
                                  # one (m,m) reduction/iter instead of three
                                  # chained ones (ops/pallas/qp_kernel.py).
                                  # On-chip (tools/tune_qp.py): same speed as
                                  # sigma=1e-6 at iterations=60, ~45% better
                                  # walking KKT (max 1.3e-3 vs 2.3e-3)
    alpha: float = 1.6            # over-relaxation
    scaling_iters: int = 4        # Ruiz equilibration sweeps (0 = off)
    ns_iters: int = 30            # Newton-Schulz iterations for matmul-only inverses
    ns_warm_iters: int = 2        # NS iterations when restarting from a carried cache
    ns_warm_iters_polish: int = 0  # same, for the polish Schur inverse only;
                                  # -1 = use ns_warm_iters.  The polish
                                  # kernel's refinement passes recompute true
                                  # KKT residuals, so its inverse tolerates
                                  # an UN-updated carried warm start (0 NS
                                  # iterations — the safeguarded cache is
                                  # used as-is as the preconditioner) while
                                  # the ADMM K^-1 (whose error shifts the
                                  # iterate unguarded) gets 2: on-chip
                                  # tuning (tools/tune_qp.py round 4) shows
                                  # 2/0 is ~14% faster than 3/1 at equal
                                  # walking quality (max KKT 1.6e-3 vs
                                  # 1.3e-3, mean 1.9e-4, 0 fallen)
    polish: bool = True           # active-set KKT polish after ADMM
    polish_rounds: int = 2        # iterated active-set refinement rounds.
                                  # Round 2 is the DROP round (driver
                                  # round 4): rows whose round-1 candidate
                                  # multiplier came out wrong-signed are
                                  # banned from round 2's estimate — the
                                  # classical active-set resolution of
                                  # stale warm-start duals that otherwise
                                  # pin a row at a bound it left (0.25 N·m
                                  # torque error at a "converged"
                                  # certificate, tools/debug_compfinal.py).
                                  # Steps whose estimate is unchanged skip
                                  # round 2 batch-wide via the `changed`
                                  # cond, so the steady-state cost is ~0.
                                  # (The earlier rounds=1 tuning predates
                                  # the drop rule and the sign-augmented
                                  # acceptance.)
    polish_reg: float = 1e-9
    polish_refine: int = 5        # coupled iterative-refinement passes per
                                  # polish round (preconditioned Richardson on
                                  # the KKT system — recovers the digits a
                                  # short warm NS inverse leaves on the table)
    # f32 tail rescue (the batched analogue of qpOASES setToReliable,
    # reference whole_body_controller.cpp:519): when any scenario's relative
    # KKT exceeds rescue_threshold after polish, the whole batch gets one
    # guarded re-solve (extra ADMM iterations from the current best iterate
    # + fresh cold-inverse polish), accepted per-scenario only where it
    # improves.  Wrapped in a batch-level lax.cond: costs nothing on the
    # (typical) steps where every scenario is already below threshold.
    rescue_threshold: float = 3e-3  # <= 0 disables
    rescue_iterations: int = 40   # round-4 re-tune: with the polish drop
    rescue_polish_rounds: int = 2  # rounds fixing active sets BEFORE the
                                  # rescue, the heavy round-3 budget
                                  # (100 it / 2 UNCOMPACTED cold polish
                                  # rounds) is wasted work — the lean 40-
                                  # iteration budget at rescue_batch=128
                                  # holds the extreme-sweep tail at
                                  # 2.85e-3 AND is faster than the heavy
                                  # budget on the sweep (54.6k vs 53.8k
                                  # steps/s) and equal on the standing
                                  # bench.  Round 5b: rounds >= 2 are
                                  # COMPACTED (rescue_round2_batch=32
                                  # default) and ~free at the 3e-3
                                  # threshold — shipped because the
                                  # ns_cold_prec win left one diverse
                                  # scenario PLATEAUED at 3.10e-3 under
                                  # the 1-round rescue (stage re-fires
                                  # stop on no-improvement; the second
                                  # cold polish round is the mechanism
                                  # that moves plateaued scenarios) —
                                  # diverse flagged_max back to 0 at
                                  # 329.6k vs 328.7k.  The measured 1e-3
                                  # frontier: 60/1 reaches 1.29e-3 at
                                  # 10.5% sweep cost; only 100/2 reaches
                                  # 9.99e-4, at 19% (tools/tune_qp.py
                                  # rescue_* configs + tune_sweep.py)
    rescue_batch: int = 128       # compact the rescue to the top-k worst
                                  # scenarios (jax.lax.top_k on the relative
                                  # KKT): the cold K^-1 / extra ADMM / cold-
                                  # Schur polish run on a gathered (k, ...)
                                  # sub-batch and accepted improvements
                                  # scatter back, so the fire cost is O(k)
                                  # instead of O(B).  0 = full-batch rescue.
                                  # Scenarios beyond the k worst keep their
                                  # un-rescued result — size k above the
                                  # per-step flagged count (measured with
                                  # tools/tune_rescue.py)
    rescue_stages: int = 3        # the rescue re-fires (lax.while_loop, one
                                  # trace) until no scenario exceeds the
                                  # threshold or this many stages ran: each
                                  # stage continues ADMM from the improved
                                  # iterate and re-estimates the active set
                                  # from a closer point, so repeated stages
                                  # clear scenarios a single pass leaves
                                  # marginally above threshold (BENCH_r02:
                                  # flagged_max was 63 with one stage)
    rescue_comp_refine: int = 2   # compensated (double-f32, error-free-
                                  # transformation) refinement passes on the
                                  # active-set KKT system as the rescue's
                                  # final candidate (ops/compensated.py):
                                  # recovers the digits that plain-f32
                                  # residual evaluation noise-floors away.
                                  # 0 disables
    comp_final_refine: int = 0    # OPTIONAL compensated (double-f32)
                                  # refinement passes on the final accepted
                                  # iterate, reusing the polish
                                  # preconditioners in hand (closed-form
                                  # H^-1 + carried/fresh Schur inverse) —
                                  # EFT residuals + 2 preconditioner
                                  # matvecs per pass, ~1.3 ms/pass at
                                  # B=4096.  Default 0: the round-4
                                  # torque-parity investigation found the
                                  # f32 tail was MIS-CLASSIFIED ACTIVE
                                  # SETS, not arithmetic — with the polish
                                  # drop rule (polish_rounds=2) + relative
                                  # activation tolerances + sign-augmented
                                  # acceptance, the walking replay reaches
                                  # p99 9.4e-5 / max 2.2e-4 N·m torque
                                  # error vs f64 (BASELINE bar 1e-3) with
                                  # comp passes off, and identically with
                                  # them on.  The rescue retains its own
                                  # compensated stage (rescue_comp_refine)
    cold_batch: int = 512         # per-scenario warm-cache gating: scenarios
                                  # whose contact set switched are re-
                                  # inverted cold on a compacted top-k
                                  # sub-batch while the rest warm-update
                                  # from the carried cache (one scenario's
                                  # switch no longer cold-starts the whole
                                  # batch).  More switched scenarios than
                                  # this falls back to the full-batch cold
                                  # inverse.  0 = batch-level gating (the
                                  # pre-round-3 behavior).  512 covers the
                                  # diverse 4-gait replay's worst step
                                  # (~495 switch edges at B=8192)
    drop_batch: int = 64          # cap the polish DROP round (round 2+) at
                                  # the k WORST scenarios the previous
                                  # round failed (a wrong-signed candidate
                                  # multiplier or a rejected candidate),
                                  # ranked by max(res, sign_violation):
                                  # gather, assemble + cold-invert their
                                  # (k, m, m) Schur systems, scatter
                                  # accepted improvements back.  A HARD
                                  # cap, no full-batch fallback — on the
                                  # extreme sweep >25% of scenarios fail
                                  # round 1 every step (stiff-contact
                                  # transients) and the full-batch cold
                                  # inverse cost 26% of throughput;
                                  # scenarios beyond the cap keep round-1
                                  # results and the staged rescue remains
                                  # the tail guarantee.  0 = full-batch
                                  # drop round (every failed scenario).
                                  # Cap frontier (in-process A/B,
                                  # round 4, tools/tune_rescue.py +
                                  # tune_sweep.py): k=64/128/256 give
                                  # evolving 356.8k/350.0k/336.8k,
                                  # diverse 319.9k/314.2k/303.6k, sweep
                                  # 58.4k/57.1k/54.6k — IDENTICAL
                                  # max-KKT / flagged / fallen /
                                  # tracking gates at every cap, even on
                                  # the diverse worst case (~495 switch
                                  # edges/step at B=8192).  The cap's
                                  # cost is per-step fixed overhead
                                  # (gather + cold (k, m, m) Schur NS
                                  # inverse + scatter), not corrections
                                  # forgone; 64 ships as measured-best
                                  # everywhere.  History 256 -> 128
                                  # (commit c3bef02 kept 128 for a 2x
                                  # correction-capacity margin while
                                  # 64's diverse rep looked like an
                                  # artifact) -> 64: the committed
                                  # BENCH_r04.json re-run resolved the
                                  # artifact question at identical
                                  # gates, and cap shortfalls are
                                  # backstopped by the staged rescue
                                  # (~495 switch edges all gated).
                                  # Torque-parity replay (B=8) is
                                  # cap-invariant: the cap binds only
                                  # when more than k scenarios fail.
    drop_fire_tol: float = 0.0    # round-5 fire bar for the drop round: a
                                  # scenario enters the compacted round 2+
                                  # only when, besides failing the previous
                                  # round (wrong-signed candidate row or a
                                  # rejected candidate), its CURRENT best
                                  # sign-augmented residual max(res, sv)
                                  # exceeds this.  The round-4 bar ("any
                                  # rejection") fired the cold compacted
                                  # Schur inverse on essentially every
                                  # step at B=8192 even when every shipped
                                  # solution was already torque-accurate —
                                  # per-step fixed overhead worth ~4.6% of
                                  # the evolving headline (VERDICT r4).
                                  # 0 = round-4 behavior (fire on any
                                  # failure).  MEASURED NO-OP on the
                                  # evolving replay (round 5, tune_rescue
                                  # ft1e6/ft1e5/ft1e4 all ~= default): at
                                  # B=8192 some scenario exceeds even
                                  # 1e-4 every step, so the cond fires
                                  # regardless — kept at 0; the round-5
                                  # recovery instead cheapens the fired
                                  # branch (in-cond assembly,
                                  # drop_sinv_refresh=0)
    drop_warm_iters: int = 0      # NS iterations to warm the drop round's
                                  # compacted (k, m, m) Schur inverse from
                                  # the carried per-scenario `sinv` rows
                                  # instead of a full cold ns_iters start.
                                  # DEFAULT 0 (cold) — round 5 measured
                                  # the warm start PARITY-UNSAFE and it
                                  # must stay off: a drop changes the
                                  # active set, and ||I - S_new W_old||
                                  # routinely exceeds NS's convergence
                                  # radius (1) while staying under the
                                  # 1e3 divergence guard, so the 8-iter
                                  # recursion blows up and the final
                                  # safeguard hands back an UN-iterated
                                  # Jacobi start -> garbage candidate ->
                                  # rejected -> correction silently lost
                                  # BELOW the KKT gates (forced-cap
                                  # parity probe: 116/200 diverse steps
                                  # over 1e-3 N*m with warm=8, 5/200
                                  # cold, identical full-branch parity).
                                  # The +2.3k solves/s it bought is not
                                  # worth a sub-gate torque regression
                                  # (PERF.md round-5 negative results)
    drop_sinv_refresh: int = 0    # 1 (round-4 behavior): scatter the drop
                                  # round's freshly inverted (k, m, m)
                                  # Schur blocks back into the carried
                                  # per-scenario sinv rows.  In the
                                  # batch-minor layout that is a
                                  # lane-axis gather + scatter over the
                                  # (m, m, B) carried tensor (~160 MB at
                                  # B=8192) on every fired step.  0 skips
                                  # the refresh: the carried rows keep
                                  # round 1's inverse — the cross-step
                                  # cache is warm-gated and safeguarded
                                  # anyway (wi_polish=0 pass-through is
                                  # protected by the polish acceptance
                                  # residuals), so staleness costs at
                                  # most an extra drop-round fire next
                                  # step.  Round-5 default 0: measured
                                  # identical gates (tune_rescue
                                  # evolving/diverse, tune_sweep) AND
                                  # bitwise-identical forced-cap parity
                                  # probes vs refresh-on (cold branch)
    drop_ns_iters: int = 0        # Newton-Schulz budget for the compacted
                                  # drop round's cold Schur inverse; 0 =
                                  # use ns_iters (30).  MEASURED
                                  # PARITY-UNSAFE at 20 and 15 (round
                                  # 5): +1.8k/+3.0k solves/s at
                                  # identical KKT gates, but the
                                  # forced-cap probes (TQ_DROP_BATCH=6
                                  # TQ_DROP_NS) show 117/200 diverse
                                  # steps over the 1e-3 N*m bar vs
                                  # 5/200 at the full 30 — the short
                                  # cold inverse leaves the corrected-
                                  # set solve unconverged, acceptance
                                  # rejects it, and the correction is
                                  # silently lost below the gates
                                  # (the same sub-gate failure shape as
                                  # drop_warm_iters).  Keep 0.
    ns_cold_prec: str = "high"    # matmul precision for the BODY
                                  # iterations of the PER-STEP cold
                                  # sub-batch NS chains (the cold-fix
                                  # (k, n, n) inverses and the drop
                                  # round's compacted Schur inverse; the
                                  # RESCUE's cold chains are explicitly
                                  # excluded — it is the tail guarantee
                                  # and stays all-highest, ops/qp.py
                                  # _rescue_core).  "high" = 3-pass
                                  # bf16 vs the ambient "highest" (6):
                                  # 3.40 -> 2.47 ms per (512, 70, 70)
                                  # cold-30 inverse (exp_ns_mixed),
                                  # +0.6% evolving / +4% diverse bench
                                  # at identical gates; the last
                                  # ns_cold_tail iterations run at full
                                  # precision.  Raw "bfloat16" bodies
                                  # DIVERGE on hard spectra and are
                                  # quality-vetoed (PERF.md round 5b).
                                  # "" = all-highest (round-5 behavior).
                                  # Any change must hold the forced-cap
                                  # torque-parity probes (the
                                  # drop_ns_iters lesson).
    ns_cold_tail: int = 10        # full-precision tail iterations when
                                  # ns_cold_prec is set.  PROBE-VALIDATED,
                                  # not assumed monotone: tail 6 AND 14
                                  # both fail the forced-cap walk probe
                                  # (2 steps over 1e-3 N*m); 10 probes
                                  # clean on walk and diverse (the
                                  # closed-loop replay is chaotic around
                                  # acceptance boundaries — re-probe any
                                  # change, TQ_NS_COLD_TAIL)
    cond_hoist: int = 0           # cond buffer-routing experiments
                                  # (bitwise-identical values on every
                                  # path).  1: route only the gathered
                                  # (k, m, m) sub-blocks through the
                                  # cold-fix conds and scatter OUTSIDE
                                  # them — measured 6% SLOWER at B=8192
                                  # (337.5k vs 360.3k, tune_rescue
                                  # hoist1/hoist0): XLA aliases cond
                                  # pass-through outputs fine, while the
                                  # hoisted lane-axis scatter into the
                                  # carried (m, m, B) tensor materializes
                                  # the full-tensor copy the in-branch
                                  # scatter avoided.  2: hoist ONLY the
                                  # drop-round's carried sinv out of its
                                  # cond outputs (no scatter involved
                                  # when drop_sinv_refresh=0).  Default
                                  # 0 = the round-4/5 structure.
    drop_approx_rank: int = 0     # 1: rank the drop round's failed
                                  # scenarios with jax.lax.approx_max_k
                                  # (the TPU-optimized partial reduction)
                                  # instead of a full top_k sort over the
                                  # (B,) severity vector.  The cap is a
                                  # heuristic (the staged rescue is the
                                  # guarantee), so ~0.95 recall of the
                                  # exact worst-k is semantically fine.
                                  # Measured ~zero win at B=8192
                                  # (tune_rescue nosinv_dw8_apx) — the
                                  # ranking is not the fixed cost; kept
                                  # available for larger batches
    rescue_round2_batch: int = 32  # compact the rescue's polish rounds >= 2
                                  # to the top-k scenarios still above
                                  # rescue_threshold after the previous
                                  # round (gather -> cold-Schur polish ->
                                  # scatter).  Round 2 is what buys the
                                  # sub-1.3e-3 sweep tail (PERF.md 1e-3
                                  # frontier) but round 4 ran it over the
                                  # whole rescue sub-batch, paying
                                  # O(rescue_batch) cold Schur inverses
                                  # when only the still-flagged few need
                                  # it.  Round-5b default 32 (with
                                  # rescue_polish_rounds=2): ~free at
                                  # the 3e-3 threshold and restores
                                  # diverse flagged_max 0 under the
                                  # ns_cold_prec defaults (see
                                  # rescue_polish_rounds).  0 =
                                  # uncompacted (round-4
                                  # behavior)
    solve_layout: str = "minor"   # "minor": the scaled-problem solve chain
                                  # (fused-setup prepared outputs -> K build
                                  # -> warm-NS K^-1 -> ADMM kernel inputs)
                                  # stays batch-minor (dims..., B) end to
                                  # end.  Batch-major (B, 42, 42)/(B, 70,
                                  # 42) f32 arrays pad 42 lanes to 128
                                  # (~3x HBM bytes) and pay a transpose
                                  # into every kernel; batch-minor pads
                                  # only sublanes and feeds the kernels'
                                  # native tile layout directly.  Requires
                                  # setup_backend pallas with fused prepare
                                  # (the default production path); QPCache
                                  # must be created with the matching
                                  # layout (ops/qp.make_cache).  On-chip
                                  # A/B (tools/tune_qp.py, B=4096): minor
                                  # 9.03 ms/step vs major 10.01 (rescue
                                  # on), 7.93 vs 9.08 (rescue off) at
                                  # identical quality gates — minor is
                                  # the default since round 3


def load_yaml_params(path: str):
    """Load a reference-format YAML (params_controller.yaml /

    params_planner.yaml name scheme) into the typed dataclasses."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    ctrl_map = {
        "friction": "friction",
        "loopRate": "loop_rate",
        "maxTorque": "max_torque",
        "kpValue": "kp",
        "kpValueZ": "kp_z",
        "kdValue": "kd",
        "kiValue": "ki",
        "kpSwingValue": "kp_swing",
        "kdSwingValue": "kd_swing",
        "slackWeight": "slack_weight",
        "initialReferencePose": "initial_reference_pose",
    }
    plan_keys = {
        "step_length", "height_control_point", "x_offset", "y_offset",
        "step_duration", "body_height", "body_final_velocity", "dt",
    }
    ctrl_kwargs = {v: raw[k] for k, v in ctrl_map.items() if k in raw}
    plan_kwargs = {k: raw[k] for k in plan_keys if k in raw}
    out = {}
    if ctrl_kwargs:
        if "initial_reference_pose" in ctrl_kwargs:
            ctrl_kwargs["initial_reference_pose"] = tuple(ctrl_kwargs["initial_reference_pose"])
        out["controller"] = ControllerParams(**ctrl_kwargs)
    if plan_kwargs:
        out["planner"] = PlannerParams(**plan_kwargs)
    return out
