"""Golden parity: our datasets vs the reference datasets on synthetic data.

A tiny on-disk world (frames + annotations) is built per dataset; both
stacks load it in val mode (deterministic transforms) and must produce
identical pixels and targets.
"""

import os
import pickle

import numpy as np
import pytest
import torch
from PIL import Image

from class_query_vad_tpu.config import get_cfg_custom

from reference_oracle import install_reference

install_reference()


def _write_frames(path, n, size=(80, 60), rng=None, ext="jpg"):
    os.makedirs(path, exist_ok=True)
    for i in range(1, n + 1):
        arr = rng.integers(0, 255, size=(size[1], size[0], 3), dtype=np.uint8)
        Image.fromarray(np.asarray(arr)).save(
            os.path.join(path, f"{i:05d}.{ext}"), quality=95
        )


def _cfg(tmp_path, name, clip_len, nc, img_size=64):
    cfg = get_cfg_custom()
    cfg.CONFIG.DATA.DATASET_NAME = name
    cfg.CONFIG.DATA.TEMP_LEN = clip_len
    cfg.CONFIG.MODEL.TEMP_LEN = clip_len
    cfg.CONFIG.DATA.IMG_SIZE = img_size
    cfg.CONFIG.DATA.NUM_CLASSES = nc
    cfg.CONFIG.DATA.DATA_PATH = str(tmp_path)
    cfg.CONFIG.DATA.ANNO_PATH = str(tmp_path)
    cfg.CONFIG.LOG.BASE_PATH = str(tmp_path)
    cfg.CONFIG.LOG.EXP_NAME = "t"
    cfg.DDP_CONFIG.DISTRIBUTED = False
    return cfg


def _compare_sample(ref_imgs, ref_target, our_clip, our_target, keys):
    ref_clip = ref_imgs.permute(1, 2, 3, 0).numpy()  # C,T,H,W -> T,H,W,C
    assert ref_clip.shape == our_clip.shape, (ref_clip.shape, our_clip.shape)
    assert np.allclose(ref_clip, our_clip, atol=1e-5), np.abs(
        ref_clip - our_clip
    ).max()
    for k in keys:
        rv = ref_target[k]
        rv = rv.numpy() if hasattr(rv, "numpy") else np.asarray(rv)
        ov = np.asarray(our_target[k])
        assert rv.shape == ov.shape, (k, rv.shape, ov.shape)
        assert np.allclose(rv.astype(np.float64), ov.astype(np.float64),
                           atol=1e-5), (k, np.abs(rv - ov).max())


def test_ava_dataset_parity(tmp_path, rng):
    root = tmp_path / "ava"
    vid = "testvid"
    _write_frames(str(root / "frames" / vid), 80, rng=rng)
    ann_dir = root / "annotations"
    os.makedirs(ann_dir)
    rows = []
    for sec, n in ((901, 2), (902, 1)):
        for i in range(n):
            x1, y1 = rng.uniform(0.1, 0.5, 2)
            rows.append(
                f"{vid},{sec:04d},{x1:.3f},{y1:.3f},{x1+0.3:.3f},{y1+0.4:.3f},"
                f"{int(rng.integers(1, 81))}\n"
            )
    (ann_dir / "ava_val_v2.2.csv").write_text("".join(rows))

    cfg = _cfg(root, "ava", clip_len=4, nc=80)
    cfg.CONFIG.DATA.FRAME_RATE = 2
    cfg.CONFIG.DATA.DATA_PATH = str(root)

    import datasets.ava_frame as ref_ava

    ref_ds = ref_ava.VideoDataset(
        str(root), clip_len=4, frame_sample_rate=2,
        transforms=ref_ava.make_transforms("val", cfg),
        resize_size=64, crop_size=64, mode="val", class_num=80,
        log_path=str(tmp_path),
    )
    from class_query_vad_tpu.datasets.ava import build_dataset

    ours = build_dataset(cfg, "val")
    assert len(ref_ds) == len(ours)
    for i in range(len(ours)):
        ref_imgs, ref_target = ref_ds[i]
        clip, target = ours[i]
        _compare_sample(ref_imgs, ref_target, clip, target,
                        ["boxes", "labels", "orig_size", "size"])


@pytest.mark.parametrize("name", ["ucf", "jhmdb"])
def test_tube_dataset_parity(tmp_path, rng, name):
    nc = 24 if name == "ucf" else 21
    clip_len = 8 if name == "ucf" else 12
    vids = [f"Cls/v_{i:04d}" for i in range(2)]
    nframes = (
        {vids[0]: 19, vids[1]: 8} if name == "ucf"
        else {vids[0]: 10, vids[1]: 8}   # jhmdb: max video len <= clip_len
    )
    resolution = {v: (60, 80) for v in vids}
    gttubes = {}
    for v in vids:
        n = nframes[v]
        if name == "jhmdb":
            start, length = 1, n
        else:
            start = int(rng.integers(1, 4))
            length = int(rng.integers(4, n - start + 1))
        rows = []
        for f in range(start, start + length):
            x1, y1 = rng.uniform(2, 30, 2)
            rows.append([f, x1, y1, x1 + 25, y1 + 20])
        gttubes[v] = {int(rng.integers(0, nc)): [np.array(rows)]}
        ext = "jpg" if name == "ucf" else "png"
        _write_frames(str(tmp_path / v), n, size=(80, 60), rng=rng, ext=ext)

    pkl = {
        "labels": [str(i) for i in range(nc)],
        "train_videos": [vids, vids, vids],
        "test_videos": [vids, vids, vids],
        "nframes": nframes,
        "resolution": resolution,
        "gttubes": gttubes,
    }
    fname = "UCF101v2-GT.pkl" if name == "ucf" else "JHMDB-GT.pkl"
    with open(tmp_path / fname, "wb") as f:
        pickle.dump(pkl, f)

    cfg = _cfg(tmp_path, name, clip_len=clip_len, nc=nc)

    if name == "ucf":
        import datasets.ucf_frame as ref_mod

        ref_ds = ref_mod.VideoDataset(
            str(tmp_path), str(tmp_path),
            transforms=ref_mod.make_transforms("val", cfg),
            clip_len=clip_len, resize_size=64, crop_size=64, mode="val",
        )
        from class_query_vad_tpu.datasets.ucf import build_dataset
    else:
        import datasets.jhmdb_frame as ref_mod

        ref_ds = ref_mod.VideoDataset(
            str(tmp_path), str(tmp_path),
            transforms=ref_mod.make_transforms("val", cfg),
            clip_len=clip_len, resize_size=64, crop_size=64, mode="val",
            split=0,
        )
        from class_query_vad_tpu.datasets.jhmdb import build_dataset

    ours = build_dataset(cfg, "val")
    assert len(ref_ds) == len(ours)
    for i in range(len(ours)):
        ref_imgs, ref_target = ref_ds[i]
        clip, target = ours[i]
        _compare_sample(
            ref_imgs, ref_target, clip, target,
            ["boxes", "labels", "orig_size", "size", "front_pad", "end_pad"],
        )
