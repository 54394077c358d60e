"""End-to-end pipeline test on a synthetic on-disk dataset.

Builds a miniature Impress-style dataset (gallery prints + queries that are
noisy crops of their true match), runs the full TPU pipeline through the
public ``Pipeline`` API, and checks its rankings against an independent
per-image oracle path: cv2 CLAHE on host + native-shape extraction +
reference-semantics NCC scoring (SURVEY.md section 4: golden end-to-end
fixture).
"""

import numpy as np
import cv2
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from shoeprint_image_retrieval_tpu.config import load_config
from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores
from shoeprint_image_retrieval_tpu.retrieval import oracle
from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline

RUN_TOML = """
[dataset]
dir = "{dir}"
type = "Impress"
crop = [0.05, 0.05]
n_processes = 2
n_clusters = 2
cluster_minimise_tolerance = 0.05

[model]
type = "VGG16"
clahe_clip_limit = 2.0
clahe_tile_grid_size = [8, 8]
start_block = 5
end_block = 3
skip_blocks = []
minimum_dim = 8
maximum_dim = 200

[comparison]
n_processes = 2
rotations = [9, 180]
scales = [1.04]

[tpu]
extraction_batch = 4
"""


def _make_dataset(root, rng, n_gallery=8, n_query=4):
    (root / "Gallery").mkdir(parents=True)
    (root / "Query").mkdir()
    pairs = {}
    texture = lambda h, w: rng.integers(30, 220, size=(h, w), dtype=np.uint8)
    for gi in range(n_gallery):
        h, w = int(rng.integers(70, 90)), int(rng.integers(60, 80))
        img = texture(h, w)
        Image.fromarray(img).save(root / "Gallery" / f"{gi + 1}_1.png")
        pairs[gi + 1] = img
    q_files = []
    for qi in range(n_query):
        gid = int(rng.integers(1, n_gallery + 1))
        src = pairs[gid]
        crop = src[5:55, 5:50].copy()
        noise = rng.integers(-15, 16, size=crop.shape)
        crop = np.clip(crop.astype(int) + noise, 0, 255).astype(np.uint8)
        # unique query filename parses to the gallery id (Impress rule:
        # int(f.split("_")[0].split(".")[0]))
        name = f"{gid}_q{qi}.png"
        Image.fromarray(crop).save(root / "Query" / name)
        q_files.append(name)
    return q_files


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_impress")
    rng = np.random.default_rng(11)
    _make_dataset(root, rng)
    return root


def test_pipeline_end_to_end_matches_oracle(dataset, tmp_path):
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(dataset)))
    config = load_config(cfg_path)

    pipe = Pipeline(config, weights_dir=None, verbose=False)
    outputs = list(pipe.run())
    assert sum(o.n_queries for o in outputs) == 4

    # oracle path: host cv2 CLAHE + native-shape extraction + reference NCC
    from shoeprint_image_retrieval_tpu.data.loader import load_images
    from shoeprint_image_retrieval_tpu.ops.preprocess import normalize_batch

    crop = config["dataset"]["crop"]
    for out, plan in zip(outputs, pipe.plans):
        q_files = sorted(plan.files)
        q_imgs = load_images(dataset / "Query", q_files, plan.scale, crop, 2)
        g_imgs = load_images(dataset / "Gallery", pipe.dataset.gallery_files, plan.scale, crop, 2)
        features, params, _ = pipe._model_for_block(plan.block)

        def native_maps(img):
            eq = cv2.createCLAHE(
                clipLimit=config["model"]["clahe_clip_limit"],
                tileGridSize=tuple(config["model"]["clahe_tile_grid_size"]),
            ).apply(img)
            x = normalize_batch(
                jnp.asarray(eq)[None],
                jnp.asarray([[eq.shape[0], eq.shape[1]]], jnp.int32),
                pipe.spec.mean, pipe.spec.std,
            )
            y, v = features.apply(
                params, x, jnp.asarray([[eq.shape[0], eq.shape[1]]], jnp.int32)
            )
            y = np.asarray(y)[0]
            hv, wv = int(v[0, 0]), int(v[0, 1])
            return y[:, :hv, :wv]

        marks = [native_maps(im) for im in q_imgs]
        prints = [native_maps(im) for im in g_imgs]
        scores = oracle.score_matrix(
            marks, prints,
            config["comparison"]["rotations"], config["comparison"]["scales"],
            "reference",
        )
        want = oracle.rank_queries(scores, out.matching_pairs)
        assert out.ranks.tolist() == want.tolist()


def test_pipeline_deterministic(dataset, tmp_path):
    """Same input -> same ranks, twice (SURVEY.md section 5: the reference's
    multiprocessing races cannot occur in a single-process jitted pipeline)."""
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(
        RUN_TOML.format(dir=str(dataset)).replace("[9, 180]", '""').replace("[1.04]", '""')
    )
    config = load_config(cfg_path)
    r1 = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]
    r2 = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]
    assert r1 == r2


def test_prewarm_matches_control_and_predicts_shapes(dataset, tmp_path):
    """tpu.prewarm compiles on a background thread from image headers alone;
    it must (a) leave rankings untouched and (b) predict the scoring compile
    signature EXACTLY — the real run must find its signature already in
    ``Pipeline._warmed`` (one signature per cluster, not two), proving the
    header-derived canvas/feature/valid arithmetic matches extraction."""
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(dataset)) + "prewarm = true\n")
    config = load_config(cfg_path)
    pipe = Pipeline(config, weights_dir=None, verbose=False)
    ranks = [o.ranks.tolist() for o in pipe.run()]
    for t in pipe._prewarm_threads:
        t.join(timeout=120)
    # exactly one scoring signature per cluster: prewarm's prediction and
    # the real run agreed (a mismatch would add a second signature)
    assert len(pipe._warmed) == len(pipe.plans), pipe._warmed

    cfg2 = tmp_path / "run_off.toml"
    cfg2.write_text(RUN_TOML.format(dir=str(dataset)) + "prewarm = false\n")
    control = [
        o.ranks.tolist()
        for o in Pipeline(load_config(cfg2), weights_dir=None, verbose=False).run()
    ]
    assert ranks == control


def test_gallery_cache_roundtrip(tmp_path):
    """RAM + disk gallery feature cache (SURVEY.md section 5: the reference's
    gitignored Memmaps experiments, now a real subsystem)."""
    import numpy as np

    from shoeprint_image_retrieval_tpu.retrieval.gallery import GalleryFeatureCache

    maps = np.random.default_rng(0).normal(size=(3, 4, 8, 8)).astype(np.float32)
    valid = np.asarray([[8, 8]] * 3, np.int32)
    key = GalleryFeatureCache.key("VGG16", 5, 0.75, ["a.png", "b.png"])
    # changed gallery listing -> different key
    assert key != GalleryFeatureCache.key("VGG16", 5, 0.75, ["a.png", "c.png"])

    disk = GalleryFeatureCache(tmp_path / "cache")
    assert disk.get(key) is None
    disk.put(key, maps, valid)
    got = disk.get(key)
    np.testing.assert_array_equal(got[0], maps)

    # a fresh instance warm-starts from disk
    disk2 = GalleryFeatureCache(tmp_path / "cache")
    got2 = disk2.get(key)
    np.testing.assert_array_equal(got2[0], maps)
    np.testing.assert_array_equal(got2[1], valid)


def test_pipeline_mixed_gray_rgb_dataset(tmp_path):
    """A dataset mixing grayscale and RGB files runs end-to-end on BOTH the
    host-CLAHE (streamed) and device-CLAHE paths, with identical rankings.

    The reference handles image modes per image (reference
    network.py:216-236), so a mixed dataset must work here too: host CLAHE
    equalizes each image per its own mode then unifies gray images onto the
    3-channel canvas; the device path extracts per-mode sub-batches on a
    shared canvas. Both are reference-semantic, so ranks must agree."""
    root = tmp_path / "mixed"
    (root / "Gallery").mkdir(parents=True)
    (root / "Query").mkdir()
    rng = np.random.default_rng(23)
    gallery = {}
    for gi in range(6):
        h, w = int(rng.integers(70, 90)), int(rng.integers(60, 80))
        if gi % 2:  # odd ids: RGB prints
            img = rng.integers(30, 220, size=(h, w, 3), dtype=np.uint8)
        else:  # even ids: grayscale prints
            img = rng.integers(30, 220, size=(h, w), dtype=np.uint8)
        Image.fromarray(img).save(root / "Gallery" / f"{gi + 1}_1.png")
        gallery[gi + 1] = img
    for qi, gid in enumerate([1, 2, 3, 4]):  # both modes among the queries
        src = gallery[gid]
        crop = src[5:55, 5:50].copy()
        noise = rng.integers(-10, 11, size=crop.shape)
        crop = np.clip(crop.astype(int) + noise, 0, 255).astype(np.uint8)
        Image.fromarray(crop).save(root / "Query" / f"{gid}_q{qi}.png")

    def run(clahe_host):
        cfg_path = tmp_path / f"run_{clahe_host}.toml"
        cfg_path.write_text(
            RUN_TOML.format(dir=str(root))
            + f"clahe_host = {'true' if clahe_host else 'false'}\n"
        )
        pipe = Pipeline(load_config(cfg_path), weights_dir=None, verbose=False)
        return [o.ranks.tolist() for o in pipe.run()]

    ranks_host = run(True)
    ranks_device = run(False)
    assert ranks_host == ranks_device
    assert sum(len(r) for r in ranks_host) == 4


def test_host_clahe_mixed_equals_per_mode(tmp_path):
    """_host_clahe on a mixed list == per-mode native CLAHE + channel
    repeat for the gray images (the post-CLAHE repeat is the reference's
    gray transform, reference network.py:55-71)."""
    from shoeprint_image_retrieval_tpu.data import native_ingest

    if not native_ingest.available():
        pytest.skip("native ingest library unavailable")
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(40, 36), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(44, 38, 3), dtype=np.uint8)

    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(tmp_path)))
    (tmp_path / "Gallery").mkdir()
    (tmp_path / "Query").mkdir()
    Image.fromarray(gray).save(tmp_path / "Gallery" / "1_1.png")
    Image.fromarray(gray).save(tmp_path / "Query" / "1_q0.png")
    pipe = Pipeline(load_config(cfg_path), weights_dir=None, verbose=False)

    out = pipe._host_clahe([gray, rgb, gray])
    assert out is not None
    eq_gray = native_ingest.clahe_batch([gray], 2.0, (8, 8))[0]
    eq_rgb = native_ingest.clahe_batch([rgb], 2.0, (8, 8))[0]
    np.testing.assert_array_equal(out[0], np.repeat(eq_gray[:, :, None], 3, 2))
    np.testing.assert_array_equal(out[1], eq_rgb)
    np.testing.assert_array_equal(out[2], np.repeat(eq_gray[:, :, None], 3, 2))
    # uniform lists keep their native rank (no gratuitous RGB expansion)
    assert pipe._host_clahe([gray, gray])[0].ndim == 2


def test_gallery_cache_key_invalidation(tmp_path):
    """The key must change when file CONTENT changes under unchanged names
    (stat fingerprint) or when a feature-affecting setting changes (params),
    so stale features are never silently served."""
    import os

    from shoeprint_image_retrieval_tpu.retrieval.gallery import GalleryFeatureCache

    d = tmp_path / "gal"
    d.mkdir()
    (d / "a.png").write_bytes(b"one")
    (d / "b.png").write_bytes(b"two")
    files = ["a.png", "b.png"]

    k0 = GalleryFeatureCache.key("VGG16", 5, 0.75, files, gallery_dir=d)
    # same content, same stats -> stable
    assert k0 == GalleryFeatureCache.key("VGG16", 5, 0.75, files, gallery_dir=d)

    # regenerated file (same name, different bytes/mtime) -> new key
    (d / "a.png").write_bytes(b"one'")
    k1 = GalleryFeatureCache.key("VGG16", 5, 0.75, files, gallery_dir=d)
    assert k1 != k0
    # mtime-only change (same size) -> new key too
    os.utime(d / "a.png", ns=(1, 1))
    assert GalleryFeatureCache.key("VGG16", 5, 0.75, files, gallery_dir=d) != k1

    # feature-affecting params fold in
    p0 = ((0, 0, 0, 0), 2.0, (8, 8), "float32")
    p1 = ((0, 0, 0, 0), 2.0, (8, 8), "bfloat16")
    ka = GalleryFeatureCache.key("VGG16", 5, 0.75, files, params=p0)
    assert ka != GalleryFeatureCache.key("VGG16", 5, 0.75, files, params=p1)
    assert ka != GalleryFeatureCache.key("VGG16", 5, 0.75, files)


def test_pipeline_gallery_cache_reuse(dataset, tmp_path):
    """Second run with a disk cache skips gallery re-extraction and produces
    identical rankings."""
    cfg_path = tmp_path / "run.toml"
    text = RUN_TOML.format(dir=str(dataset)).replace(
        "extraction_batch = 4",
        f'extraction_batch = 4\ncache_dir = "{tmp_path / "gcache"}"',
    )
    cfg_path.write_text(text)
    config = load_config(cfg_path)
    r1 = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]
    assert list((tmp_path / "gcache").glob("*.npz"))
    r2 = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]
    assert r1 == r2


def test_pipeline_sharded_matches_unsharded(dataset, tmp_path):
    """mesh_shape > 1 on the virtual 8-device mesh reproduces single-device
    rankings (gallery sharded, score rows all-gathered)."""
    base = RUN_TOML.format(dir=str(dataset))
    cfg1 = tmp_path / "one.toml"
    cfg1.write_text(base + "mesh_shape = 1\n")
    cfg8 = tmp_path / "eight.toml"
    cfg8.write_text(base + "mesh_shape = 8\n")
    r1 = [o.ranks.tolist() for o in Pipeline(load_config(cfg1), weights_dir=None, verbose=False).run()]
    r8 = [o.ranks.tolist() for o in Pipeline(load_config(cfg8), weights_dir=None, verbose=False).run()]
    assert r1 == r8


def test_pipeline_sharded_and_blocked(dataset, tmp_path):
    """Gallery sharding COMPOSED with gallery blocking (the real WVU-scale
    multi-chip configuration: each block's cache is sharded over the mesh,
    blocks streamed) reproduces single-device one-shot rankings."""
    base = RUN_TOML.format(dir=str(dataset))
    cfg1 = tmp_path / "one.toml"
    cfg1.write_text(base + "mesh_shape = 1\n")
    cfg2b = tmp_path / "two_blocked.toml"
    # block 3 rounds up to the mesh multiple 4 -> two sharded 4-print blocks
    cfg2b.write_text(base + "mesh_shape = 2\ngallery_block = 3\n")
    r1 = [o.ranks.tolist() for o in Pipeline(load_config(cfg1), weights_dir=None, verbose=False).run()]
    r2b = [o.ranks.tolist() for o in Pipeline(load_config(cfg2b), weights_dir=None, verbose=False).run()]
    assert r1 == r2b


def test_cli_output_format(dataset, tmp_path, capsys, monkeypatch):
    """run.py's stdout mirrors the reference driver's shape: dataset summary,
    cluster lines, per-query rank lines, S-score line (reference run.py:15-34,
    parse_results.py:35)."""
    import re
    import runpy
    import sys

    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(
        RUN_TOML.format(dir=str(dataset)).replace("[9, 180]", '""').replace("[1.04]", '""')
    )
    monkeypatch.setattr(sys, "argv", ["run.py", str(cfg_path)])
    monkeypatch.chdir(tmp_path)
    runpy.run_path(str((__import__("pathlib").Path(__file__).parents[1] / "run.py")), run_name="__main__")
    out = capsys.readouterr().out
    assert "The dataset contains:" in out
    assert re.search(r"\d+ clusters of image sizes found\.", out)
    assert re.search(r"Cluster has \d+ items\.", out)
    assert re.search(r"Print \d+ true match ranked \d+", out)
    assert re.search(r"S1:\d+\.\d{2} S5:\d+\.\d{2} S10:\d+\.\d{2} S15:\d+\.\d{2} S20:\d+\.\d{2}", out)


def test_profile_trace_capture(dataset, tmp_path):
    """tpu.profile_dir captures a jax.profiler trace per cluster (SURVEY.md
    section 5: the reference has no tracing at all)."""
    cfg_path = tmp_path / "run.toml"
    prof = tmp_path / "trace"
    text = RUN_TOML.format(dir=str(dataset)).replace("[9, 180]", '""').replace(
        "[1.04]", '""'
    ).replace("extraction_batch = 4", f'extraction_batch = 4\nprofile_dir = "{prof}"')
    cfg_path.write_text(text)
    list(Pipeline(load_config(cfg_path), weights_dir=None, verbose=False).run())
    assert any(prof.rglob("*.trace*")) or any(prof.rglob("*.pb")) or any(prof.iterdir())


def test_quick_start_dataset_guard(tmp_path, monkeypatch, capsys):
    """run.py first-run UX: a missing SyntheticImpress dir auto-generates
    the fixture; any OTHER missing dataset dir exits with a clear message
    instead of a deep traceback (the reference crashes on os.listdir,
    reference run.py:11 + dataloader.py:39-43)."""
    import runpy
    import sys

    import pytest as _pytest

    run_py = str((__import__("pathlib").Path(__file__).parents[1] / "run.py"))

    # (a) non-synthetic missing dir -> SystemExit with guidance
    cfg = tmp_path / "missing.toml"
    cfg.write_text(RUN_TOML.format(dir=str(tmp_path / "NoSuchDataset")))
    monkeypatch.setattr(sys, "argv", ["run.py", str(cfg)])
    with _pytest.raises(SystemExit, match="does not exist"):
        runpy.run_path(run_py, run_name="__main__")

    # (b) missing SyntheticImpress dir -> generator invoked on demand
    import scripts.make_synthetic_impress as gen_mod

    calls = []
    monkeypatch.setattr(gen_mod, "generate", lambda d, **kw: calls.append(d))
    import importlib

    run_mod = importlib.import_module("run") if "run" not in sys.modules else sys.modules["run"]
    run_mod = importlib.reload(run_mod)
    target = tmp_path / "datasets" / "SyntheticImpress" / "Dataset"
    cfg2 = {"dataset": {"dir": str(target)}}
    run_mod._ensure_dataset(cfg2)
    assert calls and str(calls[0]) == str(target)


def test_prewarm_under_mesh_matches_control(dataset, tmp_path):
    """tpu.prewarm on a mesh (VERDICT r3 item 5): round 3 disabled prewarm
    whenever mesh_shape > 1, paying every compile wall serially on real
    multi-chip runs. The lifted guard must (a) leave mesh rankings
    untouched, (b) predict the mesh scoring signature exactly (one
    signature per cluster in ``_warmed``), and (c) reproduce the
    single-device control rankings."""
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(
        RUN_TOML.format(dir=str(dataset)) + "mesh_shape = 2\nprewarm = true\n"
    )
    pipe = Pipeline(load_config(cfg_path), weights_dir=None, verbose=False)
    ranks = [o.ranks.tolist() for o in pipe.run()]
    for t in pipe._prewarm_threads:
        t.join(timeout=240)
    assert len(pipe._warmed) == len(pipe.plans), pipe._warmed

    cfg2 = tmp_path / "run_off.toml"
    cfg2.write_text(
        RUN_TOML.format(dir=str(dataset)) + "mesh_shape = 1\nprewarm = false\n"
    )
    control = [
        o.ranks.tolist()
        for o in Pipeline(load_config(cfg2), weights_dir=None, verbose=False).run()
    ]
    assert ranks == control


def test_fusion_blocks_scoring(dataset, tmp_path):
    """tpu.fusion_blocks (driver config 3): fused ranks == ranks of the SUM
    of the per-block production score matrices (score-level fusion of the
    summed-feature-map scoring across truncation blocks; reference
    scripts/summed_feature_maps.py:1-7 is the single-layer form)."""
    from dataclasses import replace

    from shoeprint_image_retrieval_tpu.metrics import ranks_from_scores

    base = RUN_TOML.format(dir=str(dataset)).replace("[9, 180]", '""').replace(
        "[1.04]", '""'
    )
    cfg_f = tmp_path / "fusion.toml"
    cfg_f.write_text(base + "fusion_blocks = [5, 4]\nprewarm = false\n")
    pipe_f = Pipeline(load_config(cfg_f), weights_dir=None, verbose=False)
    fused = list(pipe_f.run())

    cfg_c = tmp_path / "control.toml"
    cfg_c.write_text(base + "prewarm = false\n")
    pipe_c = Pipeline(load_config(cfg_c), weights_dir=None, verbose=False)
    for out, plan in zip(fused, pipe_c.plans):
        s5, q_files = pipe_c._cluster_scores(replace(plan, block=5))
        s4, _ = pipe_c._cluster_scores(replace(plan, block=4))
        want = ranks_from_scores(s5 + s4, pipe_c.dataset.matching_pairs(q_files))
        np.testing.assert_array_equal(out.ranks, want)


def test_device_resident_maps_match_host_path(dataset, tmp_path, monkeypatch):
    """Extraction hands feature maps to scoring DEVICE-resident when they fit
    ``SIR_DEVICE_MAPS_MAX`` (engine._device_maps_budget — no HBM->host->HBM
    bounce between the stages); forcing the budget to 0 keeps the round-3
    host-resident path. Both must produce identical ranks through the full
    Pipeline (the device path swaps batch_host tail padding for a clamp
    gather, host height-sort for _sort_take, and np.concatenate tail-block
    padding for jnp.pad — all bit-equal data movements)."""
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(dataset)) + "prewarm = false\n")
    config = load_config(cfg_path)

    monkeypatch.setenv("SIR_DEVICE_MAPS_MAX", "0")
    host = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]
    monkeypatch.setenv("SIR_DEVICE_MAPS_MAX", str(int(2e9)))
    dev = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]
    assert host == dev


def test_pruned_scoring_ranks_match_full_path(dataset, tmp_path):
    """tpu.pruned_scoring (exact-preserving two-pass pruned scoring,
    retrieval/pruned.py) through the full Pipeline: ranks must be identical
    to the unpruned engine run on the same dataset — the pruning bound only
    ever skips pairs that provably rank below the true match."""
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(dataset)) + "prewarm = false\n")
    config = load_config(cfg_path)
    full = [o.ranks.tolist() for o in Pipeline(config, weights_dir=None, verbose=False).run()]

    cfg2 = tmp_path / "run_pruned.toml"
    cfg2.write_text(
        RUN_TOML.format(dir=str(dataset))
        + "prewarm = false\npruned_scoring = true\nprune_channels = 16\n"
    )
    config2 = load_config(cfg2)
    pruned = [o.ranks.tolist() for o in Pipeline(config2, weights_dir=None, verbose=False).run()]
    assert pruned == full


def test_pruned_scoring_rejects_fusion():
    from shoeprint_image_retrieval_tpu.retrieval.engine import Pipeline as P

    cfg = {
        "tpu": {"pruned_scoring": True, "fusion_blocks": [3, 5]},
    }
    inst = P.__new__(P)  # no dataset needed: the guard fires first
    inst.config = cfg
    with pytest.raises(ValueError, match="pruned_scoring"):
        inst.run_cluster(plan=None)


def test_parity_harness_on_synthetic_fixture(dataset, tmp_path, capsys):
    """run.py --parity (retrieval/parity.py): the TPU pipeline and the CPU
    oracle rank identically on the synthetic fixture; both CMC lines print
    and the exit status is 0."""
    from shoeprint_image_retrieval_tpu.retrieval.parity import run_parity

    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(RUN_TOML.format(dir=str(dataset)) + "prewarm = false\n")
    status = run_parity(load_config(cfg_path))
    out = capsys.readouterr().out
    assert status == 0
    assert "PARITY: ranks identical" in out
    assert out.count("S1:") == 2  # one CMC line per side


def test_pipeline_clusters_lookahead_matches_serial(dataset, tmp_path):
    """tpu.pipeline_clusters (cluster-pipelining lookahead: cluster k+1's
    ingest + extraction overlap cluster k's scoring) must produce ranks
    identical to the strictly serial per-cluster run — same code path,
    byte-identical features, different thread."""
    cfg_path = tmp_path / "run.toml"
    cfg_path.write_text(
        RUN_TOML.format(dir=str(dataset))
        + "prewarm = false\npipeline_clusters = false\n"
    )
    serial = [o.ranks.tolist() for o in Pipeline(load_config(cfg_path), weights_dir=None, verbose=False).run()]

    cfg2 = tmp_path / "run_pipelined.toml"
    cfg2.write_text(
        RUN_TOML.format(dir=str(dataset))
        + "prewarm = false\npipeline_clusters = true\n"
    )
    pipe = Pipeline(load_config(cfg2), weights_dir=None, verbose=False)
    overlapped = [o.ranks.tolist() for o in pipe.run()]
    assert overlapped == serial
    assert pipe._lookahead is None  # drained by close()
