"""End-to-end self-training loop on a tiny VOC-like fixture: the full
train() path (aug, batching, optimization, periodic eval, best-checkpointing)."""
import numpy as np
import pytest
from pathlib import Path
from PIL import Image

from deep_spectral_tpu.models import ViTConfig
from deep_spectral_tpu.tasks import semantic_segmentation as SS

TINY = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("voc_train")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    segs = root / "pseudolabels"
    segs.mkdir()
    rng = np.random.default_rng(0)
    names = [f"t{i:02d}" for i in range(8)]
    for n in names:
        # learnable signal: class = (left dark / right bright)
        img = np.zeros((64, 64, 3), np.uint8)
        img[:, :32] = rng.integers(0, 60)
        img[:, 32:] = rng.integers(180, 250)
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        gt = np.zeros((64, 64), np.uint8)
        gt[:, 32:] = 1
        Image.fromarray(gt).save(root / "SegmentationClass" / f"{n}.png")
        Image.fromarray(gt[::16, ::16]).save(segs / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text(
        "\n".join(names[6:]))
    return root, segs


def test_train_loop_data_parallel_mesh(voc_root, tmp_path):
    """DP training over the 8-device CPU mesh runs and learns."""
    from deep_spectral_tpu.parallel import make_mesh
    root, segs = voc_root
    train_ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         resize_size=40, batch_size=8, lr=5e-3,
                         max_train_steps=12, unfrozen_backbone_layers=0)
    mesh = make_mesh()
    state, _ = SS.train(cfg, train_ds, mesh=mesh, log_every=0, max_steps=12,
                        metrics_path=str(tmp_path / "m.jsonl"))
    assert int(state.step) == 12
    miou, _ = SS.evaluate_model(state, train_ds, num_classes=2, max_images=4)
    assert miou > 0.4
    assert (tmp_path / "m.jsonl").is_file()


def test_train_loop_end_to_end(voc_root, tmp_path):
    root, segs = voc_root
    train_ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         resize_size=40, batch_size=4, lr=5e-3,
                         max_train_steps=30, unfrozen_backbone_layers=0)
    state, best = SS.train(cfg, train_ds, dataset_val=train_ds,
                           ckpt_dir=str(tmp_path / "ckpt"),
                           eval_every=15, log_every=0, max_steps=30)
    assert int(state.step) == 30
    # Best checkpoint written during eval.
    assert (tmp_path / "ckpt" / "best").is_dir()
    miou, _ = SS.evaluate_model(state, train_ds, num_classes=2, max_images=4)
    assert miou > 0.5, miou  # trivially separable task

    # generate job dumps pred/gt PNGs
    SS.generate_predictions(state, train_ds, tmp_path / "gen", max_images=2)
    assert len(list((tmp_path / "gen" / "pred").iterdir())) == 2
    assert len(list((tmp_path / "gen" / "gt").iterdir())) == 2


def test_nan_guard_reverts_full_state(rng):
    """A non-finite loss must revert params AND optimizer moments AND BN stats
    AND EMA — otherwise NaN Adam moments poison the next (finite-loss) step."""
    import jax
    import jax.numpy as jnp
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         batch_size=2, use_ema=True, unfrozen_backbone_layers=-1)
    model = SS.build_model(cfg)
    state = SS.create_train_state(cfg, model)
    good = np.asarray(rng.standard_normal((2, 32, 32, 3)), np.float32)
    labels = np.asarray(rng.integers(0, 2, (2, 32, 32)), np.int32)
    key = jax.random.PRNGKey(0)
    # One good step to get non-trivial moments.
    state, logs = SS.train_step(state, jnp.asarray(good), jnp.asarray(labels),
                                key, use_ema=True, ema_decay=0.9)
    assert np.isfinite(float(logs["loss"]))
    before = jax.tree.map(np.asarray, (state.params, state.opt_state,
                                       state.batch_stats, state.ema_params))
    bad = good.copy()
    bad[0, 0, 0, 0] = np.nan
    state2, logs2 = SS.train_step(state, jnp.asarray(bad), jnp.asarray(labels),
                                  key, use_ema=True, ema_decay=0.9)
    assert not np.isfinite(float(logs2["loss"]))
    after = jax.tree.map(np.asarray, (state2.params, state2.opt_state,
                                      state2.batch_stats, state2.ema_params))
    flat_b = jax.tree_util.tree_leaves(before)
    flat_a = jax.tree_util.tree_leaves(after)
    assert len(flat_b) == len(flat_a)
    for b, a in zip(flat_b, flat_a):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
    # And a following good step must stay finite.
    state3, logs3 = SS.train_step(state2, jnp.asarray(good), jnp.asarray(labels),
                                  key, use_ema=True, ema_decay=0.9)
    assert np.isfinite(float(logs3["loss"]))
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree_util.tree_leaves(state3.params))


def test_resume_runs_only_remaining_steps(voc_root, tmp_path):
    """Resuming must continue from the restored step, not re-run max_steps."""
    root, segs = voc_root
    train_ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         resize_size=40, batch_size=2, lr=1e-3,
                         max_train_steps=6, unfrozen_backbone_layers=0)
    state, _ = SS.train(cfg, train_ds, log_every=0, max_steps=6)
    path = SS.save_checkpoint(str(tmp_path / "ck"), state, 6)
    cfg2 = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                          resize_size=40, batch_size=2, lr=1e-3,
                          max_train_steps=10, unfrozen_backbone_layers=0)
    state2, _ = SS.train(cfg2, train_ds, log_every=0, max_steps=10,
                         resume=str(path))
    assert int(state2.step) == 10  # 6 restored + 4 remaining, not 6 + 10


def test_restore_ema_presence_mismatch(voc_root, tmp_path):
    """Restoring across a use_ema config change must not crash on an orbax
    tree-structure mismatch."""
    cfg_noema = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                               batch_size=2, use_ema=False)
    model = SS.build_model(cfg_noema)
    state_noema = SS.create_train_state(cfg_noema, model)
    p1 = SS.save_checkpoint(str(tmp_path / "a"), state_noema, 1)

    cfg_ema = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                             batch_size=2, use_ema=True)
    state_ema = SS.create_train_state(cfg_ema, SS.build_model(cfg_ema))
    # no-EMA checkpoint -> EMA config: EMA params keep their init values
    restored = SS.restore_checkpoint(str(p1), state_ema)
    assert restored.ema_params is not None
    assert int(restored.step) == int(state_noema.step)
    # EMA checkpoint -> no-EMA config: EMA entry ignored
    p2 = SS.save_checkpoint(str(tmp_path / "b"), state_ema, 2)
    restored2 = SS.restore_checkpoint(str(p2), state_noema)
    assert restored2.ema_params is None
    assert int(restored2.step) == int(state_ema.step)


@pytest.fixture(scope="module")
def voc_root_multishape(tmp_path_factory):
    """VOC-like fixture with VARYING image shapes (all multiples of 16 so the
    per-image path's floor-crop is a no-op and parity can be exact)."""
    root = tmp_path_factory.mktemp("voc_shapes")
    (root / "JPEGImages").mkdir()
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    segs = root / "pseudolabels"
    segs.mkdir()
    rng = np.random.default_rng(3)
    shapes = [(64, 96), (96, 64), (80, 80), (64, 64), (64, 96), (96, 80)]
    names = [f"s{i:02d}" for i in range(len(shapes))]
    for n, (h, w) in zip(names, shapes):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        img[:, : w // 2] //= 3  # structure: dark left half
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        gt = np.zeros((h, w), np.uint8)
        gt[:, w // 2:] = 1
        Image.fromarray(gt).save(root / "SegmentationClass" / f"{n}.png")
        Image.fromarray(gt[::16, ::16]).save(segs / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("")
    return root, segs


def test_bucketed_eval_matches_per_image(voc_root_multishape):
    """Bucket-padded evaluation (<= 2 compiled programs for 4 distinct image
    shapes) must be PIXEL-EXACT vs the per-image path: per-image pos-embed
    interpolation, masked attention, mask-threaded head convs and
    edge-replicated logits make padding provably inert."""
    import jax.numpy as jnp
    root, segs = voc_root_multishape
    ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         batch_size=2, unfrozen_backbone_layers=0)
    state = SS.create_train_state(cfg, SS.build_model(cfg))

    # Per-image reference predictions (native resolution, one compile each).
    ref = {}
    for i in range(len(ds)):
        image, _, _, _ = ds[i]
        x = SS.normalize_image(image)[None]
        ref[i] = np.asarray(SS.eval_step(state, jnp.asarray(x)))[0]

    got = dict(SS.bucketed_predictions(state, ds, list(range(len(ds))),
                                       patch_size=8, batch_size=4))
    assert set(got) == set(ref)
    for i in ref:
        assert got[i].shape == ref[i].shape
        agree = np.mean(got[i] == ref[i])
        np.testing.assert_array_equal(got[i], ref[i],
                                      err_msg=f"image {i}: {agree:.4f} agree")

    # And the mIoU paths agree exactly.
    m_ref, _ = SS.evaluate_model(state, ds, num_classes=2, patch_size=8)
    m_bkt, _ = SS.evaluate_model(state, ds, num_classes=2, patch_size=8,
                                 bucketed=True, batch_size=4)
    assert abs(m_ref - m_bkt) < 1e-9, (m_ref, m_bkt)


def test_bf16_precision_knob(rng):
    """precision='bf16' trains with a bf16 backbone and stays loss-close to fp32."""
    import jax
    import jax.numpy as jnp
    losses = {}
    for prec in ("fp32", "bf16"):
        cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                             batch_size=2, precision=prec,
                             unfrozen_backbone_layers=-1)
        model = SS.build_model(cfg)
        state = SS.create_train_state(cfg, model)
        x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
        y = jnp.asarray(rng.integers(0, 2, (2, 32, 32)), jnp.int32)
        _, logs = SS.train_step(state, x, y, jax.random.PRNGKey(0))
        losses[prec] = float(logs["loss"])
    assert np.isfinite(losses["bf16"])
    assert abs(losses["bf16"] - losses["fp32"]) < 0.05 * max(abs(losses["fp32"]), 1.0)


def test_upsample_pseudolabel_matches_resize_nearest(rng):
    """The producer-thread numpy upsample must match ops.resize.resize_nearest
    (cv2 INTER_NEAREST index semantics) exactly — it replaced a per-image JAX
    dispatch that cost a remote round-trip on tunneled TPUs."""
    import jax.numpy as jnp
    from deep_spectral_tpu.ops.resize import resize_nearest
    for (h_in, w_in), (h_out, w_out) in [((20, 30), (320, 480)),
                                         ((24, 32), (384, 512)),
                                         ((7, 9), (100, 130)),
                                         ((16, 16), (16, 16)),
                                         ((50, 50), (30, 20)),
                                         # f64-vs-f32 index rounding traps:
                                         # host must use f32 like the device
                                         ((8, 3), (282, 123)),
                                         ((3, 8), (123, 282)),
                                         ((13, 11), (500, 437))]:
        seg = rng.integers(0, 21, (h_in, w_in)).astype(np.uint8)
        got = SS.upsample_pseudolabel(seg, (h_out, w_out))
        ref = np.array(resize_nearest(jnp.asarray(seg.astype(np.int32)),
                                      (h_out, w_out)))
        np.testing.assert_array_equal(got, ref, err_msg=f"{(h_in, w_in)}->{(h_out, w_out)}")


def test_in_train_eval_is_bucketed(voc_root_multishape):
    """VERDICT r2 #2: train()'s periodic eval must take the bucketed path —
    O(buckets) new compiled eval programs (not one per distinct val-image
    shape, which costs 40-300 s per shape over a remote-compile tunnel), and
    zero per-image eval_step programs."""
    root, segs = voc_root_multishape
    ds = SS.VOCSegmentationWithPseudolabels(str(root), "all", str(segs))
    cfg = SS.TrainConfig(backbone=TINY, num_classes=2, crop_size=32,
                         resize_size=40, batch_size=2, lr=1e-3,
                         max_train_steps=2, unfrozen_backbone_layers=0)
    before_bucketed = SS.eval_step_bucketed._cache_size()
    before_per_image = SS.eval_step._cache_size()
    SS.train(cfg, ds, dataset_val=ds, eval_every=2, log_every=0, max_steps=2)
    new_bucketed = SS.eval_step_bucketed._cache_size() - before_bucketed
    new_per_image = SS.eval_step._cache_size() - before_per_image
    assert new_per_image == 0, "in-train eval compiled per-image programs"
    # 4 distinct shapes in the fixture -> <= 2 landscape/portrait buckets
    assert 1 <= new_bucketed <= 2, new_bucketed
