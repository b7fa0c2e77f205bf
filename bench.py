"""Benchmark: VITON-HD try-on inference at the reference operating point —
768x1024, 30 denoise steps, CFG 2.0, batch 2 (reference: inference.py:53-61,
BASELINE.md) — on one TPU chip, random weights (FLOPs are weight-agnostic).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

Baseline: the reference publishes no numbers (BASELINE.md); the comparison
point is the BASELINE.json north star "A100-class images/sec/chip". A100
SDXL-inpainting with a second full UNet forward per step at fp16/batch 2 runs
~4 s/image (~0.25 img/s) — used as the denominator.

The whole stack is ~6.7B params = 13.5 GB bf16 vs 16 GB v5e HBM, so the bench
runs phase-at-a-time: init each tower, run its stage, free it. The dominant
dual-UNet denoise phase runs FIRST (on synthetic cond tensors of the exact
encoder-output shapes — throughput is input-value-agnostic), then VAE
decode/encode, then the text and vision towers; a wall-clock watchdog emits
the result from measured phases if the budget nears (see BUDGET_S).
The denoise STEP is jitted and python-looped (compiling the full 30-step scan
through the remote-compile tunnel takes tens of minutes vs ~2 min for the
step; dispatch overhead is negligible at ~0.5 s/step).
"""

import functools
import json
import os
import signal
import subprocess
import sys
import threading
import time

BASELINE_IMG_PER_SEC = 0.25  # est. A100-class at this operating point
# per-phase upper bounds ~3x the measured r2 values (vae encode 0.27 s,
# text 0.05 s + vision 0.29 s, decode 0.20 s)
ENCODE_EST_UB = {"vae": 0.8, "towers": 1.0, "text": 0.5, "vision": 0.5}
DECODE_EST_UB = 0.8


def _result_from_state(st):
    """Build the JSON result dict from a (possibly partial) state snapshot.
    stdlib-only: shared by the in-process emit and the out-of-process
    watchdog. Returns (result_or_None, description)."""
    if not st or st.get("denoise") is None or not st.get("batch"):
        return None, ("denoise not yet measured - no honest partial number. "
                      "Likely cause: server-side compile-queue backlog or a "
                      "wedged relay (see CLAUDE.md).")
    est = []
    enc = sum(st.get("encode_parts", {}).values())
    if not st.get("encode_all"):
        missing = sorted(set(st.get("encode_expected", ["vae", "towers"]))
                         - set(st.get("encode_parts", {})))
        enc += sum(ENCODE_EST_UB.get(m, 1.0) for m in missing)
        est.extend(f"encode:{m}" for m in missing)
    dec = st.get("decode")
    if dec is None:
        dec = DECODE_EST_UB
        est.append("decode")
    total = enc + st["denoise"] + dec
    img_per_sec = st["batch"] / total
    result = {
        "metric": st["metric"],
        "value": round(img_per_sec, 4),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC, 3),
        # provenance IN the record (a partial value must not be misread as
        # a clean number): which phases carry upper-bound estimates
        "partial": bool(est),
        "estimated_phases": est,
    }
    desc = (f"encode {enc:.2f}s denoise {st['denoise']:.2f}s dec {dec:.2f}s; "
            f"sec/img {total / st['batch']:.2f}"
            + (f"; PARTIAL (upper-bound estimates for: {est})" if est else ""))
    return result, desc


def _read_journal(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _watchdog_subprocess_main(ppid: int, journal: str, deadline: float) -> int:
    """Out-of-process watchdog (run with `python -S`, no sitecustomize, no
    jax): the axon relay client can block the parent WITHOUT releasing the
    GIL, so in-process threads and python signal handlers never run there
    (round-2 postmortem: the driver's bench died rc=124 with zero output; the
    thread watchdog silently never fired). This process shares the parent's
    stdout, so it can emit the JSON line from the journaled phase results and
    SIGKILL the wedged parent."""
    def parent_alive():
        try:
            os.kill(ppid, 0)
            return True
        except OSError:
            return False

    while time.time() < deadline:
        st = _read_journal(journal)
        if st and st.get("emitted"):
            return 0
        if not parent_alive():
            # parent exited; honor its emit if journaled, else stay quiet
            # (a crash before any measurement has nothing honest to report)
            return 0
        time.sleep(2.0)
    st = _read_journal(journal) or {}
    if st.get("emitted"):
        return 0
    result, desc = _result_from_state(st)
    print(f"[watchdog] budget expired during phase {st.get('phase')!r}; "
          f"{desc}", file=sys.stderr, flush=True)
    if result is not None:
        print(json.dumps(result), flush=True)
    try:
        os.kill(ppid, signal.SIGKILL)
    except OSError:
        pass
    return 0 if result is not None else 3


if len(sys.argv) > 1 and sys.argv[1] == "--watchdog":
    sys.exit(_watchdog_subprocess_main(
        int(sys.argv[2]), sys.argv[3], float(sys.argv[4])))

import jax

if os.environ.get("BENCH_PLATFORM"):
    # sitecustomize pre-imports jax with the axon TPU platform; env
    # JAX_PLATFORMS alone is too late for this process.
    jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

TINY = os.environ.get("BENCH_TINY") == "1"
BATCH = int(os.environ.get("BENCH_BATCH", "2"))
STEPS = int(os.environ.get("BENCH_STEPS", "30"))
REPS = int(os.environ.get("BENCH_REPS", "2"))
IMPL = os.environ.get("BENCH_IMPL")  # None -> auto (pallas on tpu)
# "every_step" (reference semantics, headline) | "once" (garment features
# computed at the mid-schedule timestep and reused)
GARMENT_CACHE = os.environ.get("BENCH_GARMENT_CACHE", "every_step")

# Wall-clock watchdog (round-2 postmortem: the driver's run died rc=124 with
# zero output after a server-side compile-queue stall — silent timeouts lose
# the whole round's measurement). On expiry the watchdog emits the JSON line
# from the phases measured so far, with documented CONSERVATIVE upper-bound
# estimates for any missing minor phase (so the reported img/s only ever
# understates reality), then hard-exits. The denoise phase is never
# estimated: without it there is no honest number, so expiry before it logs
# a diagnosis and exits 3.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1080"))

T_START = time.time()
STATE = {
    "encode_parts": {},   # phase name -> measured seconds
    "encode_expected": ["vae", "towers"],  # phases the estimator backfills
    "encode_all": False,  # all encode phases measured
    "denoise": None,      # best measured denoise seconds
    "decode": None,
    "batch": None,
    "metric": None,
    "phase": "startup",
    "emitted": False,
}
_EMIT_LOCK = threading.Lock()
_JOURNAL = os.environ.get("BENCH_JOURNAL",
                          f"/tmp/idmvton_bench_journal_{os.getpid()}.json")


def log(msg):
    print(f"[{time.time() - T_START:7.1f}s] {msg}", file=sys.stderr, flush=True)
    _journal()  # every phase transition logs — keep the journal current


def _journal():
    """Persist STATE so the out-of-process watchdog can emit a partial
    result even when this process is wedged inside the relay client."""
    try:
        tmp = _JOURNAL + ".tmp"
        with open(tmp, "w") as f:
            json.dump(STATE, f)
        os.replace(tmp, _JOURNAL)
    except OSError:
        pass


def _spawn_watchdog():
    """Start the `--watchdog` subprocess (python -S: no sitecustomize, no
    jax, no relay). It inherits stdout, so it can print the JSON line and
    SIGKILL this process if the relay wedges us with the GIL held — an
    in-process thread or signal handler never runs in that state."""
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    return subprocess.Popen(
        [sys.executable, "-S", os.path.abspath(__file__), "--watchdog",
         str(os.getpid()), _JOURNAL, repr(T_START + BUDGET_S)],
        env=env, stdin=subprocess.DEVNULL)


def _emit(partial: bool) -> bool:
    """Print the ONE JSON result line. Returns True if emitted."""
    with _EMIT_LOCK:
        if STATE["emitted"]:
            return True
        result, desc = _result_from_state(STATE)
        if result is None:
            return False
        print(json.dumps(result), flush=True)
        STATE["emitted"] = True
        _journal()
        log(f"# {desc}; backend {jax.default_backend()}")
        return True


def _watchdog():
    # in-process fallback (fires 30 s before the subprocess so the clean
    # path wins when the process is healthy)
    wake = T_START + BUDGET_S - 30.0
    while time.time() < wake and not STATE["emitted"]:
        time.sleep(min(5.0, max(0.1, wake - time.time())))
    if STATE["emitted"]:
        return
    log(f"WATCHDOG(thread): budget {BUDGET_S:.0f}s expiring during phase "
        f"'{STATE['phase']}' — emitting partial result")
    if _emit(partial=True):
        os._exit(0)
    log("WATCHDOG(thread): denoise not yet measured — no honest partial "
        "number. Likely causes: still in phase 'startup' = axon device "
        "init/claim hung (relay outage — r5 saw one >2h); otherwise "
        "server-side compile-queue backlog (compiles queue even after "
        "killed clients; see CLAUDE.md).")
    os._exit(3)


def _on_term(signum, frame):
    log(f"signal {signum} during phase '{STATE['phase']}'")
    if _emit(partial=True):
        os._exit(0)
    os._exit(3)


def free(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        leaf.delete()


def sync(tree):
    """Force completion with a VALUE readback — through the axon relay,
    block_until_ready returns without blocking, so timings must fetch data."""
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(jnp.sum(leaf.ravel()[:1].astype(jnp.float32)))


def main():
    # Watchdogs FIRST — before ANY jax device use. The first device op is
    # not in phase code: DDPMScheduler.__init__ builds jnp tables, and
    # backend init itself can hang forever when the axon relay is down
    # (r5 outage: jax.devices() blocked indefinitely at claim time). With
    # the spawn here, an outage still produces a diagnosis + rc 3 at the
    # budget deadline instead of the driver's silent rc=124.
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)
    _journal()
    threading.Thread(target=_watchdog, daemon=True).start()
    wd = _spawn_watchdog()

    from idmvton_tpu.core.config import (
        SchedulerConfig, UNetConfig, VAEConfig, CLIPTextConfig,
        CLIPVisionConfig, ResamplerConfig,
    )
    from idmvton_tpu.diffusion.scheduler import DDPMScheduler, classifier_free_guidance
    from idmvton_tpu.models.unet import init_unet, unet_apply
    from idmvton_tpu.models.vae import init_vae, vae_encode, vae_decode
    from idmvton_tpu.models.clip import (
        init_clip_text, clip_text_apply, init_clip_vision, clip_vision_apply,
    )
    from idmvton_tpu.models.resampler import init_resampler, resampler_apply
    from idmvton_tpu.utils.fast_init import fast_random_params

    dtype = jnp.bfloat16
    if TINY:
        b, img_h, img_w = 2, 64, 64
        unet_cfg, garm_cfg = UNetConfig.tiny("consume"), UNetConfig.tiny("emit")
        vae_cfg = VAEConfig.tiny()
        clip_l_cfg = CLIPTextConfig.tiny()
        clip_g_cfg = CLIPTextConfig.tiny(hidden_size=32, projection_dim=64,
                                         use_final_projection=True)
        vision_cfg, rs_cfg = CLIPVisionConfig.tiny(), ResamplerConfig.tiny()
        seq = 7
    else:
        b, img_h, img_w = BATCH, 1024, 768
        unet_cfg, garm_cfg = UNetConfig.sdxl_tryon(), UNetConfig.sdxl_garment()
        vae_cfg = VAEConfig.sdxl()
        clip_l_cfg, clip_g_cfg = CLIPTextConfig.clip_l(), CLIPTextConfig.clip_bigg()
        vision_cfg, rs_cfg = CLIPVisionConfig.vit_h(), ResamplerConfig.sdxl_plus()
        seq = 77

    lat_h, lat_w = img_h // vae_cfg.downscale, img_w // vae_cfg.downscale
    sched = DDPMScheduler(SchedulerConfig.sdxl_inference())

    STATE["batch"] = b
    STATE["metric"] = (f"tryon_images_per_sec_per_chip_{img_w}x{img_h}_"
                       f"{STEPS}steps_cfg2_b{b}"
                       + ("_garmcache" if GARMENT_CACHE == "once" else ""))
    _journal()  # metric/batch now known — refresh for the watchdog

    # NO dedicated preflight compile: it is purely diagnostic and costs one
    # extra SERIAL compile-queue job — measured 2.5 s on a clean queue but
    # 65-393 s of pure budget loss in exactly the dirty-queue runs where the
    # budget matters (r4). The first init's wall time below is the queue
    # health read instead (healthy: ~20-35 s for a UNet init).

    def finit(fn, seed):
        t0 = time.time()
        p = fast_random_params(jax.random.PRNGKey(seed), fn)
        sync(p)
        dt = time.time() - t0
        log(f"  init {dt:.1f}s" +
            ("  ** QUEUE BACKLOG SUSPECTED **" if dt > 120 else ""))
        return p

    ks = jax.random.split(jax.random.PRNGKey(1), 9)
    vocab = clip_l_cfg.vocab_size
    isz = vision_cfg.image_size
    person = jax.random.uniform(ks[0], (b, img_h, img_w, 3), dtype, -1, 1)
    pose = jax.random.uniform(ks[1], (b, img_h, img_w, 3), dtype, -1, 1)
    cloth = jax.random.uniform(ks[2], (b, img_h, img_w, 3), dtype, -1, 1)
    mask = (jax.random.uniform(ks[3], (b, img_h, img_w, 1)) > 0.5).astype(dtype)
    ids = lambda k: jax.random.randint(ks[k], (3 * b, seq), 0, vocab)
    ip_pixels = jax.random.uniform(ks[7], (b, isz, isz, 3), dtype, -1, 1)

    # ---- phase 1: dual-UNet denoise — FIRST. It is ~93% of the metric; a
    # degraded server-side compile queue must not be able to starve the
    # headline phase (round-2 postmortem: driver bench died in an encoder
    # phase before any number existed). The cond tensors are synthetic with
    # the exact shapes/dtypes the encoder phases produce — throughput is
    # input-value-agnostic.
    STATE["phase"] = "unets"
    log("phase unets")
    ctx_dim = clip_l_cfg.hidden_size + clip_g_cfg.hidden_size
    n_ip = rs_cfg.num_queries
    rk = jax.random.split(jax.random.PRNGKey(2), 8)
    rnd = lambda i, shape: jax.random.normal(rk[i], shape,
                                             jnp.float32).astype(dtype)
    lc = vae_cfg.latent_channels
    cond = {
        "context": rnd(0, (2 * b, seq + n_ip, ctx_dim)),
        "add_text_embeds": rnd(1, (2 * b, clip_g_cfg.projection_dim)),
        "time_ids": jnp.tile(jnp.asarray(
            [img_h, img_w, 0, 0, img_h, img_w], dtype)[None], (2 * b, 1)),
        "mask_2b": (jax.random.uniform(rk[2], (2 * b, lat_h, lat_w, 1))
                    > 0.5).astype(dtype),
        "masked_2b": rnd(3, (2 * b, lat_h, lat_w, lc)),
        "pose_2b": rnd(4, (2 * b, lat_h, lat_w, lc)),
        "cloth_lat": rnd(5, (b, lat_h, lat_w, lc)),
        "cloth_embeds": rnd(6, (b, seq, ctx_dim)),
    }
    sync(cond)

    # one init program per UNet: merging both into one flat-buffer program
    # was measured to OOM at compile (the fused threefry iota for 5.15B
    # elements materializes u32[8.6e9] = 34 GB > HBM)
    p_unet = finit(lambda k: init_unet(k, unet_cfg, dtype=dtype), 15)
    p_garm = finit(lambda k: init_unet(k, garm_cfg, dtype=dtype), 16)

    _int8 = os.environ.get("IDMVTON_GEMM_INT8", "0")
    if _int8 in ("1", "2"):
        # W8A8 int8 on the ln_linear sites (ops/quant.py) — A/B knob,
        # default OFF; 1 = TryonNet only, 2 = both towers; quality bound
        # in tests/test_pipeline.py
        from idmvton_tpu.ops.quant import quantize_unet_linears_int8
        t0 = time.time()
        p_unet = quantize_unet_linears_int8(p_unet)
        if _int8 == "2":
            # emit tower: ff.proj_in only (its to_qkv never reaches the
            # W8A8 kernel — see quantize_unet_linears_int8 docstring)
            p_garm = quantize_unet_linears_int8(p_garm, attn_qkv=False)
        sync(p_unet)
        log(f"  int8-quantized ln_linear sites, mode {_int8} "
            f"({time.time()-t0:.1f}s)")

    guidance = 2.0

    # donate lat: steps chain in-place; per-step sync below keeps at most one
    # step's workspace live (async dispatch of several ~3GB-workspace steps
    # over the tunnel OOMs 16GB HBM next to 10.3GB of weights)
    @jax.jit
    def garm_feats_fn(pg, cond, t):
        # cond batch only — the CFG uncond half's zero garment KV is folded
        # in analytically by the attention kernel (garment_uncond_zero)
        _, feats = unet_apply(pg, garm_cfg, cond["cloth_lat"], t,
                              cond["cloth_embeds"], impl=IMPL)
        return feats

    def _tryon_step(pu, cond, lat, t, prev_t, rng, feats_cfg):
        unet_in = jnp.concatenate(
            [jnp.concatenate([lat] * 2, axis=0), cond["mask_2b"],
             cond["masked_2b"], cond["pose_2b"]], axis=-1)
        pred, _ = unet_apply(pu, unet_cfg, unet_in, t, cond["context"],
                             added_cond=(cond["add_text_embeds"],
                                         cond["time_ids"]),
                             garment_features=feats_cfg,
                             garment_uncond_zero=True, impl=IMPL)
        uncond, condp = jnp.split(pred, 2, axis=0)
        guided = classifier_free_guidance(uncond, condp, guidance)
        noise = jax.random.normal(rng, lat.shape, jnp.float32).astype(lat.dtype)
        new_lat, _ = sched.step(guided, t, prev_t, lat, noise)
        return new_lat

    # BENCH_SPLIT_STEP (default ON): compile the garment fwd and the tryon
    # step as TWO smaller programs instead of one fused step — remote compile
    # time grows superlinearly with graph size (measured 390.9 s vs 409.8 s
    # fused), the per-step feats handoff (~0.3 GB bf16 in HBM) plus the extra
    # dispatch hide in the async step stream, and the steady-state denoise
    # measured FASTER (7.05/7.06 s vs 7.14/7.15 s fused, same night, r4).
    SPLIT_STEP = os.environ.get("BENCH_SPLIT_STEP", "1") == "1"

    @functools.partial(jax.jit, donate_argnums=(2,))
    def tryon_step_fn(pu, cond, lat, t, prev_t, rng, feats_cfg):
        return _tryon_step(pu, cond, lat, t, prev_t, rng, feats_cfg)

    @functools.partial(jax.jit, donate_argnums=(3,))
    def step_fn(pu, pg, cond, lat, t, prev_t, rng, feats_cached=None):
        feats_cfg = (garm_feats_fn.__wrapped__(pg, cond, t)
                     if feats_cached is None else feats_cached)
        return _tryon_step(pu, cond, lat, t, prev_t, rng, feats_cfg)

    ts = np.asarray(sched.timesteps(STEPS))
    prev_ts = np.asarray(sched.prev_timesteps(sched.timesteps(STEPS), STEPS))

    feats_cached = None
    if GARMENT_CACHE == "once":
        feats_cached = garm_feats_fn(p_garm, cond,
                                     jnp.int32(ts[STEPS // 2]))
        sync(feats_cached)

    def denoise(rng):
        r_init, r_steps = jax.random.split(rng)
        lat = jax.random.normal(r_init, (b, lat_h, lat_w, lc),
                                jnp.float32).astype(dtype)
        step_rngs = jax.random.split(r_steps, STEPS)
        for i in range(STEPS):
            if SPLIT_STEP:
                feats = (garm_feats_fn(p_garm, cond, jnp.int32(ts[i]))
                         if feats_cached is None else feats_cached)
                lat = tryon_step_fn(p_unet, cond, lat, jnp.int32(ts[i]),
                                    jnp.int32(prev_ts[i]), step_rngs[i],
                                    feats)
            else:
                lat = step_fn(p_unet, p_garm, cond, lat, jnp.int32(ts[i]),
                              jnp.int32(prev_ts[i]), step_rngs[i],
                              feats_cached=feats_cached)
        sync(lat)  # one readback after the enqueued chain completes
        return lat

    t0 = time.time()
    lat = denoise(jax.random.PRNGKey(20))
    log(f"  denoise compile+run {time.time() - t0:.1f}s")

    denoise_times = []
    for i in range(REPS):
        t0 = time.time()
        lat = denoise(jax.random.PRNGKey(21 + i))
        denoise_times.append(time.time() - t0)
        STATE["denoise"] = min(denoise_times)
        _journal()
    log(f"  denoise times {['%.2f' % t for t in denoise_times]}")

    # ---- phase 2: VAE decode (UNets freed first: fp32 decode activations
    # at 768x1024 don't fit next to 10.3 GB of UNet weights)
    STATE["phase"] = "decode"
    log("phase decode")
    if not TINY:
        free((p_unet, p_garm))
    p_vae = finit(lambda k: init_vae(k, vae_cfg, dtype=dtype), 14)

    @jax.jit
    def decode_fn(p, lat):
        return jnp.clip(vae_decode(p, vae_cfg, lat), -1, 1)

    # min of 2 timed reps for every small phase: a single rep is exposed to
    # relay-contention spikes (r4: a one-shot towers rep read 1.05 s vs the
    # 0.34 s clean measurement while leftover compile jobs drained). Inputs
    # vary per rep AND vs the warmup (rolled along latent H, so they differ
    # even at batch 1) so no dispatch can be deduped against a previous one.
    lat2 = jnp.roll(lat, 1, axis=1)
    sync(decode_fn(p_vae, jnp.roll(lat, 2, axis=1)))  # warmup, 3rd input
    img = None
    best = None
    for l in (lat, lat2):
        t0 = time.time()
        img = decode_fn(p_vae, l)
        sync(img)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    STATE["decode"] = best
    log(f"  decode {STATE['decode']:.2f}s; output {img.shape}")

    # ---- phase 3: VAE encodes (masked person / pose / cloth batched to 3B;
    # VAE params still resident from the decode phase)
    STATE["phase"] = "vae"
    log("phase vae encode")

    @jax.jit
    def vae_fn(p, imgs, rng):
        return vae_encode(p, vae_cfg, imgs, rng=rng)

    masked_person = person * (mask < 0.5).astype(dtype)
    imgs3 = jnp.concatenate([masked_person, pose, cloth], axis=0)
    sync(vae_fn(p_vae, imgs3, ks[8]))
    best = None
    for seed in (99, 100):  # fresh rng per rep — no dedup vs warmup/rep 1
        t0 = time.time()
        lats = vae_fn(p_vae, imgs3, jax.random.PRNGKey(seed))
        sync(lats)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    STATE["encode_parts"]["vae"] = best
    log(f"  vae encode {STATE['encode_parts']['vae']:.2f}s")
    if not TINY:
        free(p_vae)

    # ---- phase 4: text + vision towers, ONE init program + ONE jit program
    # (four separate inits + two compiles cost r3 ~170 s of serial
    # compile-queue time; the merged phase is ~2 jobs instead of 6 — all
    # four towers are ~3 GB bf16, fine side-by-side with the UNets freed)
    STATE["phase"] = "towers"
    log("phase towers (text + vision)")
    # two medium init programs (~0.8B elements each) instead of four small
    # ones; a single 4-tower program would push the fused threefry iota
    # toward the HBM ceiling (see the UNet-init note above)
    p_l, p_g = finit(
        lambda k: (init_clip_text(k, clip_l_cfg, dtype=dtype),
                   init_clip_text(jax.random.fold_in(k, 1), clip_g_cfg,
                                  dtype=dtype)), 10)
    p_v, p_r = finit(
        lambda k: (init_clip_vision(k, vision_cfg, dtype=dtype),
                   init_resampler(jax.random.fold_in(k, 1), rs_cfg,
                                  dtype=dtype)), 12)

    @jax.jit
    def towers_fn(pl, pg, pv, pr, ids_l, ids_g, px):
        out_l = clip_text_apply(pl, clip_l_cfg, ids_l)
        out_g = clip_text_apply(pg, clip_g_cfg, ids_g)
        embeds = jnp.concatenate(
            [out_l["penultimate"], out_g["penultimate"]], axis=-1)
        vis = clip_vision_apply(pv, vision_cfg, px)
        ip_tokens = resampler_apply(pr, rs_cfg, vis["penultimate"])
        return embeds, out_g["pooled"], ip_tokens

    px2 = jnp.concatenate([jnp.zeros_like(ip_pixels), ip_pixels], axis=0)
    sync(towers_fn(p_l, p_g, p_v, p_r, ids(4), ids(4), px2))  # compile
    best = None
    for k in (5, 6):  # fresh token ids per rep — no dedup
        t0 = time.time()
        embeds, pooled, ip_tokens = towers_fn(p_l, p_g, p_v, p_r, ids(k),
                                              ids(k), px2)
        sync(embeds)
        sync(ip_tokens)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    STATE["encode_parts"]["towers"] = best
    log(f"  towers {STATE['encode_parts']['towers']:.2f}s")
    if not TINY:
        free((p_l, p_g, p_v, p_r))

    STATE["encode_all"] = True
    STATE["phase"] = "done"
    _emit(partial=False)
    try:
        wd.terminate()
    except OSError:
        pass
    try:
        os.unlink(_JOURNAL)
    except OSError:
        pass


if __name__ == "__main__":
    main()
