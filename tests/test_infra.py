"""Config system, data pipeline, checkpointing, converter, CLI plumbing."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from image_compression_tpu.config import Config, EdgeTarget
from image_compression_tpu.io.converter import convert_dataset
from image_compression_tpu.io.image_io import (find_image_files_recursively,
                                               load_image, write_image)
from image_compression_tpu.train.data import ImageBatches
from image_compression_tpu.train.checkpoint import (CheckpointManager,
                                                    load_params, save_params,
                                                    tree_equal)


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.image_size = 128
    cfg.edge_target = EdgeTarget.CANNY
    cfg.rl.lr = 5e-5
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg.to_dict()))
    back = Config.from_json(path)
    assert back.image_size == 128
    assert back.edge_target == EdgeTarget.CANNY
    assert back.rl.lr == 5e-5
    assert back.reward.beta == 0.012167  # defaults preserved


def test_config_rejects_unknown():
    with pytest.raises(KeyError):
        Config.from_dict({"nonsense": 1})


def _make_dataset(tmp_path, rng, n=6, size=24, fmt="png"):
    paths = []
    for i in range(n):
        img = rng.integers(0, 256, (size, size, 3), np.uint8)
        p = tmp_path / f"im_{i}.{fmt}"
        write_image(p, img)
        paths.append(p.with_suffix(".png"))
    return paths


def test_find_images_recursive(tmp_path, rng):
    (tmp_path / "sub").mkdir()
    write_image(tmp_path / "a.png", rng.integers(0, 256, (8, 8, 3), np.uint8))
    write_image(tmp_path / "sub" / "b.png",
                rng.integers(0, 256, (8, 8, 3), np.uint8))
    (tmp_path / "c.txt").write_text("x")
    found = find_image_files_recursively(tmp_path, "png")
    assert [p.name for p in found] == ["a.png", "b.png"]


def test_image_batches_pretrain_mode(tmp_path, rng):
    paths = _make_dataset(tmp_path, rng)
    data = ImageBatches(paths, batch_size=2, image_size=24, drop_last=True)
    batches = list(data.epoch(0))
    assert len(batches) == 3 == len(data)
    assert batches[0].shape == (2, 24, 24, 3)
    assert batches[0].dtype == np.float32
    assert 0.0 <= batches[0].min() and batches[0].max() <= 1.0


def test_image_batches_rl_mode_and_resize(tmp_path, rng):
    paths = _make_dataset(tmp_path, rng, n=3, size=30)
    data = ImageBatches(paths, batch_size=2, image_size=16,
                        with_file_sizes=True, drop_last=False)
    batches = list(data.epoch(0))
    assert len(batches) == 2
    images, sizes = batches[0]
    assert images.shape == (2, 16, 16, 3)
    assert (sizes > 0).all()  # actual on-disk byte counts


def test_image_batches_shuffle_determinism(tmp_path, rng):
    paths = _make_dataset(tmp_path, rng)
    data = ImageBatches(paths, batch_size=3, image_size=24, seed=5)
    a = np.concatenate([b for b in data.epoch(1)])
    b = np.concatenate([b for b in data.epoch(1)])
    c = np.concatenate([b for b in data.epoch(2)])
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_converter(tmp_path, rng):
    img = rng.integers(0, 256, (40, 50, 3), np.uint8)
    from PIL import Image
    Image.fromarray(img).save(tmp_path / "x.jpeg")
    n = convert_dataset(tmp_path, source_format="jpeg", width=16, height=16)
    assert n == 1
    out = load_image(tmp_path / "x.png")
    assert out.shape == (16, 16, 3)


def test_checkpoint_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros((3,))}}
    save_params(tmp_path / "p_params", params)
    back = load_params(tmp_path / "p_params", params)
    assert tree_equal(params, back)


def test_checkpoint_manager_tags(tmp_path):
    mgr = CheckpointManager(tmp_path, "fcn_pretrained", run_id="123")
    state = {"w": jnp.ones((2, 2)), "step": jnp.asarray(7)}
    path = mgr.save("best", state)
    assert path.name == "fcn_pretrained_123_best"
    back = mgr.restore("best", state)
    assert tree_equal(state, back)


def test_cli_reassemble_smoke(tmp_path, rng, capsys):
    from image_compression_tpu.io.slicer import write_slices
    from image_compression_tpu.cli.main import main

    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    write_slices(img, np.zeros((16, 16), np.int64), tmp_path, "s")
    out = tmp_path / "rec.png"
    main(["reassemble", str(tmp_path / "s"), "-o", str(out)])
    assert out.exists()


def test_profiling_phase_timer():
    from image_compression_tpu.utils.profiling import PhaseTimer
    t = PhaseTimer()
    with t.phase("a"):
        x = jnp.ones((4,)) * 2
    with t.phase("a", block_on=x):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_image_batches_yield_indices(tmp_path, rng):
    paths = _make_dataset(tmp_path, rng, n=5)
    data = ImageBatches(paths, batch_size=2, image_size=24,
                        yield_indices=True, drop_last=False, seed=1)
    seen = []
    for images, indices in data.epoch(0):
        assert images.shape[0] == len(indices)
        seen.extend(indices.tolist())
    assert sorted(seen) == list(range(5))


def test_compute_global_pos_weight(tmp_path, rng):
    from image_compression_tpu.train.pretrain import compute_global_pos_weight

    paths = _make_dataset(tmp_path, rng, n=4, size=32)
    cfg = Config()
    cfg.image_size = 32
    cfg.edge_target = EdgeTarget.CANNY
    data = ImageBatches(paths, batch_size=2, image_size=32, drop_last=False)
    w = compute_global_pos_weight(data, cfg)
    # random-noise images: Canny cuts some edges; ratio finite and positive
    assert 0 < w < 100


def test_cli_compress_learned_checkpoint(tmp_path, rng, capsys):
    """The learned compress path through the CLI: save params, compress with
    --checkpoint, reassemble losslessly."""
    import jax

    from image_compression_tpu.cli.main import main
    from image_compression_tpu.io.image_io import ensure_rgba, load_image
    from image_compression_tpu.io.reassemble import reassemble_array
    from image_compression_tpu.models.unet import EdgeUNet
    from image_compression_tpu.train.checkpoint import save_params

    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    write_image(data_dir / "im.png", img)

    model = EdgeUNet(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    ckpt = tmp_path / "p_params"
    save_params(ckpt, params)

    main(["compress", "--dataset-dir", str(data_dir), "--results-dir",
          str(tmp_path / "results"), "--checkpoint", str(ckpt)])
    out = capsys.readouterr().out
    assert "compressed" in out

    canvas = reassemble_array(tmp_path / "results" / "im")
    np.testing.assert_array_equal(canvas,
                                  ensure_rgba(load_image(data_dir / "im.png")))
