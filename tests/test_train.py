"""Training-loop tests: convergence on a synthetic scene, single- vs multi-device
step execution, LR schedule semantics, checkpoint save/restore roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spnerf_tpu.config import LossConfig, ModelConfig, RenderConfig
from spnerf_tpu.parallel import data_mesh
from spnerf_tpu.train.checkpoints import CheckpointManager
from spnerf_tpu.train.loop import Trainer, make_lr_schedule


def _tiny_configs(**rc_kw):
    mc = ModelConfig(fc_units=32, fc_layers=2, skips=(), mapping=True)
    rc = RenderConfig(n_samples=6, compute_dtype="float32", **rc_kw)
    lc = LossConfig()
    return mc, rc, lc


def _fake_data(rng, n=2048):
    o = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
    d = np.tile(np.array([[0.1, 0.2, -0.97]], np.float32), (n, 1))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    sun = np.tile(np.array([[0.3, 0.3, 0.9]], np.float32), (n, 1))
    sun /= np.linalg.norm(sun, axis=-1, keepdims=True)
    rays = np.concatenate([o, d, np.zeros((n, 1), np.float32),
                           np.full((n, 1), 1.2, np.float32), sun], -1)
    rgbs = np.tile(np.array([[0.2, 0.5, 0.7]], np.float32), (n, 1))
    return {
        "rays": rays, "rgbs": rgbs, "ids": np.zeros(n, np.int32),
        "depths": np.zeros((n, 2), np.float32),
        "valid_depth": np.zeros(n, np.float32),
        "depth_std": np.zeros(n, np.float32),
        "sems": np.full(n, -100, np.int32),
    }


def test_lr_schedule_steplr_equivalence():
    sched = make_lr_schedule(1e-3, steps_per_epoch=100)
    np.testing.assert_allclose(sched(0), 1e-3)
    np.testing.assert_allclose(sched(99), 1e-3)
    np.testing.assert_allclose(sched(100), 9e-4, rtol=1e-6)
    np.testing.assert_allclose(sched(250), 1e-3 * 0.9 ** 2, rtol=1e-6)


def test_single_device_converges(rng):
    mc, rc, lc = _tiny_configs()
    tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=100, max_steps=1000)
    state = tr.init_state(jax.random.PRNGKey(0))
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng).items()}
    step = tr.build_train_step(128)
    key = jax.random.PRNGKey(1)
    state, ld0 = step(state, data, key)
    first = float(ld0["loss"])
    for _ in range(40):
        state, ld = step(state, data, key)
        jax.block_until_ready(ld["loss"])
    assert float(ld["loss"]) < first * 0.5
    assert int(state.step) == 41


def test_compiler_options_step_matches_default(rng):
    """--xla_opts routes DebugOptions through lower().compile(); a benign
    option must produce the same numerics as the default jit path (and the
    wrapper must not break donation/caching across calls)."""
    from spnerf_tpu.config import parse_xla_opts

    opts = parse_xla_opts("xla_embed_ir_in_executable=true")
    assert opts == {"xla_embed_ir_in_executable": True}

    mc, rc, lc = _tiny_configs()
    data = _fake_data(rng, n=512)
    results = []
    for copts in (None, opts):
        tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=100,
                     max_steps=1000, compiler_options=copts)
        state = tr.init_state(jax.random.PRNGKey(0))
        d = {k: jnp.asarray(v) for k, v in data.items()}
        step = tr.build_train_step(64)
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            state, ld = step(state, d, key)
        results.append((jax.device_get(state.params), float(ld["loss"])))
    (p0, l0), (p1, l1) = results
    assert l0 == l1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)


def test_compiler_options_mesh_scan_matches_default(rng):
    """--xla_opts with --data_axis K dispatches the MESH scan through the
    lower/compile shim: a benign option must match the unwrapped mesh scan
    bitwise (the shim wraps the outer jit around shard_map)."""
    from spnerf_tpu.parallel import data_mesh

    mesh = data_mesh(8)
    mc, rc, lc = _tiny_configs()
    data_np = _fake_data(rng, n=1024)
    results = []
    for copts in (None, {"xla_embed_ir_in_executable": True}):
        tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=100,
                     max_steps=1000, mesh=mesh, compiler_options=copts)
        state = tr.replicate_state(tr.init_state(jax.random.PRNGKey(0)))
        data = tr.shard_data(data_np)
        run = tr.build_train_scan(64, 3)
        state, ld = run(state, data, jax.random.PRNGKey(1))
        results.append((jax.device_get(state.params),
                        float(jax.device_get(ld["loss"]))))
    (p0, l0), (p1, l1) = results
    assert l0 == l1
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), p0, p1)


def test_parse_xla_opts_rejects_malformed():
    from spnerf_tpu.config import parse_xla_opts

    with pytest.raises(ValueError):
        parse_xla_opts("no_equals_sign")
    assert parse_xla_opts("") == {}


def test_mesh_step_runs_and_updates(rng):
    mesh = data_mesh(8)
    mc, rc, lc = _tiny_configs(solar_correction=True)
    lc = LossConfig(sc_lambda=0.05)
    tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=100, max_steps=1000,
                 mesh=mesh)
    state = tr.replicate_state(tr.init_state(jax.random.PRNGKey(0)))
    p0 = jax.device_get(state.params)
    data = tr.shard_data(_fake_data(rng, n=2000))  # non-multiple of 8 -> pads
    step = tr.build_train_step(128)
    state, ld = step(state, data, jax.random.PRNGKey(1))
    jax.block_until_ready(ld["loss"])
    assert np.isfinite(float(ld["loss"]))
    p1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(lambda a, b: np.abs(a - b).max(), p0, p1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0


def test_checkpoint_roundtrip(tmp_path, rng):
    mc, rc, lc = _tiny_configs()
    tr = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=10, max_steps=100)
    state = tr.init_state(jax.random.PRNGKey(0))
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng, 512).items()}
    step = tr.build_train_step(64)
    for _ in range(3):
        state, ld = step(state, data, jax.random.PRNGKey(1))
        jax.block_until_ready(ld["loss"])

    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    mgr.save(3, state, metrics={"val_psnr": 21.5})
    mgr.save(7, state, metrics={"val_psnr": 19.0})  # later but worse
    mgr.close()

    mgr2 = CheckpointManager(str(tmp_path / "ckpts"))
    assert mgr2.latest_step() == 7
    assert mgr2.best_step() == 3  # ranked by val_psnr, not recency
    fresh = tr.init_state(jax.random.PRNGKey(42))
    restored = mgr2.restore(fresh, step=mgr2.best_step())
    assert restored is not None
    assert int(restored.step) == 3
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(restored.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # training continues from the restored state
    state2, ld2 = step(restored, data, jax.random.PRNGKey(1))
    assert int(state2.step) == 4
    mgr2.close()


def test_scan_matches_stepwise(rng):
    """build_train_scan(k) must produce bitwise the same state as k calls of
    build_train_step (same PRNG: fold_in(key, state.step))."""
    mc, rc, lc = _tiny_configs()
    data = {k: jnp.asarray(v) for k, v in _fake_data(rng, 512).items()}
    key = jax.random.PRNGKey(3)

    tr1 = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=10, max_steps=100,
                  donate=False)
    s1 = tr1.init_state(jax.random.PRNGKey(0))
    step = tr1.build_train_step(64)
    for _ in range(5):
        s1, ld1 = step(s1, data, key)
        jax.block_until_ready(ld1["loss"])

    tr2 = Trainer(mc, rc, lc, lr=1e-3, steps_per_epoch=10, max_steps=100,
                  donate=False)
    s2 = tr2.init_state(jax.random.PRNGKey(0))
    run = tr2.build_train_scan(64, 5)
    s2, ld2 = run(s2, data, key)

    assert int(s1.step) == int(s2.step) == 5
    np.testing.assert_allclose(float(ld1["loss"]), float(ld2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lr_default_resolves_per_encoding(tmp_path):
    """--lr defaults per encoding: 5e-4 for siren (the reference's value,
    main.py:96) and 1e-2 for hash (NGP-style table lr — measured on the
    v5e: 5e-4 costs ~1.3 m DSM MAE on the tuned-depth 3k schedule).
    Explicit --lr always wins."""
    from spnerf_tpu.config import build_train_parser, finalize_args

    base = ["--aoi_id", "JAX_269", "--model", "sp-nerf",
            "--project_dir", str(tmp_path)]
    p = build_train_parser()
    assert finalize_args(p.parse_args(base), make_dirs=False).lr == 5e-4
    assert finalize_args(
        p.parse_args(base + ["--encoding", "hash"]),
        make_dirs=False).lr == 1e-2
    assert finalize_args(
        p.parse_args(base + ["--encoding", "hash", "--lr", "3e-3"]),
        make_dirs=False).lr == 3e-3


@pytest.mark.slow
def test_cli_watchdog_recovers_from_hang(dfc269_root, tmp_path, monkeypatch):
    """--watchdog N: a mid-run hang (mocked via SPNERF_TEST_HANG_ONCE) is
    detected by metrics.jsonl silence, the child is killed, and a relaunch
    with --auto_resume finishes the run — zero operator action (VERDICT r2
    weak #4; two real hangs observed on the tunneled TPU)."""
    import json
    import os

    from spnerf_tpu.cli.train import main as train_main

    proj = tmp_path / "proj"
    (proj / "dataset").mkdir(parents=True)
    os.symlink(dfc269_root, proj / "dataset" / "DFC2019_269")
    marker = tmp_path / "hang_marker"
    monkeypatch.setenv("SPNERF_TEST_HANG_ONCE", str(marker))
    # the supervised children are fresh interpreters: pin them to CPU (the
    # in-process jax.config pin from conftest does not reach a subprocess)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # launch from OUTSIDE the repo: the relaunch runs `-m
    # spnerf_tpu.cli.train` in a fresh interpreter, which must resolve the
    # package via the injected PYTHONPATH regardless of the user's cwd
    # (regression: 20 failed relaunches on hardware when main.py was
    # invoked by absolute path from another directory)
    monkeypatch.chdir(tmp_path)
    if True:
        rc = train_main([
            "--aoi_id", "JAX_269", "--model", "sp-nerf", "--exp_name", "wd",
            "--no_timestamp_exp_name", "--project_dir", str(proj),
            "--img_downscale", "8", "--batch_size", "64", "--n_samples", "4",
            "--fc_units", "32", "--fc_layers", "2", "--chunk", "2048",
            "--log_every", "10", "--check_val_every_n_epoch", "1",
            "--save_every_n_epochs", "1", "--data_axis", "1",
            "--max_train_steps", "30", "--watchdog", "20",
        ])
    assert rc == 0
    assert marker.exists()  # the hang actually happened
    # the relaunch completed the run: metrics reach max_train_steps
    metrics = proj / "output" / "wd" / "logs" / "metrics.jsonl"
    steps = [json.loads(line)["step"] for line in metrics.read_text()
             .splitlines() if line.strip()]
    assert max(steps) >= 30


def test_cli_auto_resume(dfc269_root, tmp_path, capsys):
    """--auto_resume picks up the experiment's newest checkpoint: a relaunch
    continues from the saved step instead of re-initializing (recovery story
    for spontaneous TPU-runtime faults; reference only has --ckpt_path,
    main.py:325)."""
    import os

    from spnerf_tpu.cli.train import main as train_main

    proj = tmp_path / "proj"
    (proj / "dataset").mkdir(parents=True)
    os.symlink(dfc269_root, proj / "dataset" / "DFC2019_269")
    argv = [
        "--aoi_id", "JAX_269", "--model", "sp-nerf", "--exp_name", "ar",
        "--no_timestamp_exp_name", "--project_dir", str(proj),
        "--img_downscale", "8", "--batch_size", "64", "--n_samples", "4",
        "--fc_units", "32", "--fc_layers", "2", "--chunk", "2048",
        "--log_every", "10", "--check_val_every_n_epoch", "1",
        "--save_every_n_epochs", "1", "--data_axis", "1",
    ]
    state1 = train_main(argv + ["--max_train_steps", "20"])
    assert int(state1.step) == 20

    state2 = train_main(argv + ["--max_train_steps", "40", "--auto_resume"])
    out = capsys.readouterr().out
    assert "auto-resumed ar at step 20" in out
    assert int(state2.step) == 40

    # re-invoking a COMPLETED run must exit cleanly (no re-validation, no
    # orbax StepAlreadyExistsError from a duplicate final save)
    state3 = train_main(argv + ["--max_train_steps", "40", "--auto_resume"])
    out = capsys.readouterr().out
    assert "nothing to do" in out
    assert int(state3.step) == 40


def test_val_labels_disambiguate_repeated_frames():
    """Multi-AOI frame copies repeat image ids; labels get a frame suffix.
    Unique ids (single-AOI or distinct AOIs) pass through unchanged."""
    from types import SimpleNamespace as NS

    from spnerf_tpu.cli.train import _val_labels

    s1, s2 = object(), object()
    rec = lambda i: NS(img_id=i)

    # single scene, unique ids: unchanged
    items = [("A", s1, rec("A_006")), ("A", s1, rec("A_011"))]
    assert _val_labels(items) == ["A_006", "A_011"]

    # dual copies of one AOI: every repeated id gains its scene's frame index
    items = [("A", s1, rec("A_006")), ("A", s1, rec("A_011")),
             ("A", s2, rec("A_006")), ("A", s2, rec("A_011"))]
    assert _val_labels(items) == ["A_006.f0", "A_011.f0",
                                  "A_006.f1", "A_011.f1"]

    # distinct AOIs with distinct ids: unchanged even though scenes differ
    items = [("A", s1, rec("A_006")), ("B", s2, rec("B_004"))]
    assert _val_labels(items) == ["A_006", "B_004"]


def test_val_metrics_nan_never_outranks_real():
    """A validation pass with no val rows yields NaN psnr; the checkpoint
    metric substitutes -inf so orbax's best_fn (max val_psnr) never ranks a
    metric-less save above a real one (ADVICE r4: NaN sorted first)."""
    from spnerf_tpu.cli.train import _val_metrics

    assert _val_metrics({"psnr": 21.5}) == {"val_psnr": 21.5}
    assert _val_metrics({})["val_psnr"] == float("-inf")
    assert _val_metrics({"psnr": float("nan")})["val_psnr"] == float("-inf")
    # and the ordering orbax applies is now well-defined:
    assert _val_metrics({"psnr": 1.0})["val_psnr"] > _val_metrics({})["val_psnr"]


def test_weight_decay_decoupled_semantics():
    """--weight_decay: AdamW-style decay on every leaf — with zero gradient,
    one step shrinks a param by exactly lr * wd * param (decay is added after
    Adam scaling and multiplied by the lr schedule). The table-only knob
    composes: table rows decay at table_wd + weight_decay."""
    import optax

    from spnerf_tpu.train.loop import make_optimizer

    lr, wd, twd = 0.01, 0.1, 0.2
    params = {"dense": jnp.ones((3,)), "table": 2.0 * jnp.ones((4,))}
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)

    tx = make_optimizer(lambda step: lr, weight_decay=wd)
    st = tx.init(params)
    upd, _ = tx.update(zeros, st, params)
    new = optax.apply_updates(params, upd)
    np.testing.assert_allclose(new["dense"], (1 - lr * wd) * np.ones(3),
                               rtol=1e-6)
    np.testing.assert_allclose(new["table"], (1 - lr * wd) * 2 * np.ones(4),
                               rtol=1e-6)

    tx2 = make_optimizer(lambda step: lr, table_wd=twd, weight_decay=wd)
    st2 = tx2.init(params)
    upd2, _ = tx2.update(zeros, st2, params)
    new2 = optax.apply_updates(params, upd2)
    np.testing.assert_allclose(new2["dense"], (1 - lr * wd) * np.ones(3),
                               rtol=1e-6)
    np.testing.assert_allclose(new2["table"],
                               (1 - lr * (wd + twd)) * 2 * np.ones(4),
                               rtol=1e-6)

    # default path stays the plain optax.adam transformation (state layout
    # checkpoint-compatible with every pre-flag run)
    tx3 = make_optimizer(lambda step: lr)
    assert isinstance(tx3.init(params), tuple) and len(tx3.init(params)) == 2


def test_lr_gamma_knob():
    """--lr_gamma changes the per-epoch StepLR decay; default 0.9 stays the
    reference schedule (modules/utils.py:317-318)."""
    sched = make_lr_schedule(1e-2, 100)
    sched66 = make_lr_schedule(1e-2, 100, gamma=0.656)
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(250)) == pytest.approx(1e-2 * 0.9**2)
    assert float(sched66(250)) == pytest.approx(1e-2 * 0.656**2)


def test_grad_clip_semantics():
    """--grad_clip: global-norm clipping BEFORE Adam — a huge gradient is
    rescaled so the chain's Adam update stays bounded, and small gradients
    pass through unchanged (clip is inactive below the norm)."""
    import optax

    from spnerf_tpu.train.loop import make_optimizer

    lr = 0.01
    params = {"w": jnp.ones((4,))}
    tx = make_optimizer(lambda step: lr, grad_clip=1.0)
    st = tx.init(params)
    big = {"w": jnp.full((4,), 1e6)}
    upd, _ = tx.update(big, st, params)
    # Adam normalizes magnitude anyway; the observable is that the update is
    # finite and lr-bounded even for a 1e6 gradient
    assert np.all(np.isfinite(upd["w"]))
    assert np.max(np.abs(upd["w"])) <= lr * 1.001

    # clipping inactive for small grads: matches the unclipped chain exactly
    tx_ref = make_optimizer(lambda step: lr, weight_decay=0.0,
                            grad_clip=1e9)  # effectively no clip, same chain
    small = {"w": jnp.full((4,), 1e-3)}
    u1, _ = tx.update(small, tx.init(params), params)
    u2, _ = tx_ref.update(small, tx_ref.init(params), params)
    np.testing.assert_allclose(u1["w"], u2["w"], rtol=1e-6)
