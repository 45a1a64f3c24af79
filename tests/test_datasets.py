"""Dataset loaders: synthetic fixtures on disk -> coherent ray batches."""

import json
import os

import numpy as np
import pytest

from neural_radiance_caching_tpu.data import camera_utils, datasets, env_maps
from neural_radiance_caching_tpu.engine.configs import Config


def _pose(i, n):
    return camera_utils.generate_spherical_poses(n, radius=4.0, seed=3)[i]


def _transforms(n, res, focal_frac=1.2):
    frames = []
    for i in range(n):
        m = np.eye(4, dtype=np.float32)
        m[:3, :4] = _pose(i, n)
        frames.append({"file_path": f"train/r_{i}", "transform_matrix": m.tolist()})
    return {
        "camera_angle_x": float(2 * np.arctan(0.5 / focal_frac)),
        "w": res, "h": res,
        "frames": frames,
    }


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray((np.clip(arr, 0, 1) * 255).astype(np.uint8)).save(path)


@pytest.fixture(scope="module")
def blender_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blender")
    res, n = 8, 3
    for split in ("train", "test"):
        meta = _transforms(n, res)
        for f in meta["frames"]:
            f["file_path"] = f["file_path"].replace("train/", f"{split}/")
        with open(d / f"transforms_{split}.json", "w") as fp:
            json.dump(meta, fp)
        for i in range(n):
            rgba = np.random.RandomState(i).rand(res, res, 4)
            _write_png(str(d / split / f"r_{i}.png"), rgba)
    return str(d)


def test_blender_loader(blender_dir):
    config = Config(dataset_loader="blender", near=0.1, far=5.0, batch_size=16,
                    linear_to_srgb=True)
    ds = datasets.load_dataset("train", blender_dir, config)
    assert ds.images.shape == (3, 8, 8, 3)
    batch = ds.next_train()
    assert batch.rays.origins.shape == (16, 3)
    assert np.isfinite(batch.rays.directions).all()
    assert batch.rgb.shape == (16, 3)
    eval_batch = ds.generate_ray_batch(1)
    assert eval_batch.rgb.shape == (64, 3)


def test_blender_active_loader(blender_dir):
    config = Config(dataset_loader="blender_active", near=0.1, far=5.0,
                    batch_size=8, linear_to_srgb=True)
    ds = datasets.load_dataset("train", blender_dir, config)
    batch = ds.next_train()
    assert batch.rgb.shape == (8, 3)
    assert np.isfinite(batch.rays.lights).all()


@pytest.fixture(scope="module")
def transient_dir(tmp_path_factory):
    import h5py

    d = tmp_path_factory.mktemp("transient")
    res, n, total_bins = 8, 3, 24
    meta = _transforms(n, res)
    for f in meta["frames"]:
        f["file_path"] = f["file_path"].replace("train/", "frames/") + ".h5"
    for split in ("train", "test"):
        with open(d / f"transforms_{split}.json", "w") as fp:
            json.dump(meta, fp)
    os.makedirs(d / "frames")
    rng = np.random.RandomState(0)
    for i in range(n):
        with h5py.File(d / "frames" / f"r_{i}.h5", "w") as f:
            f["data"] = rng.rand(res, res, total_bins, 3).astype(np.float32)
    # Flattened training stream.
    m = 256
    os.makedirs(d / "train_efficient")
    for name, arr in (
        ("x", rng.randint(0, res, m)),
        ("y", rng.randint(0, res, m)),
        ("file_indices", rng.randint(0, n, m)),
        ("samples", rng.rand(m, total_bins, 3).astype(np.float32)),
    ):
        with h5py.File(d / "train_efficient" / f"{name}.h5", "w") as f:
            f["dataset"] = arr
    return str(d)


def test_transient_simulation_loader(transient_dir):
    config = Config(
        dataset_loader="transient_simulation", near=0.1, far=5.0, batch_size=32,
        use_transient=True, n_bins=16, start_bin=2, test_start_bin=2,
        height=8, width=8, test_height=8, test_width=8, vis_only=True,
    )
    ds = datasets.load_dataset("train", transient_dir, config)
    batch = ds.next_train()
    assert batch.rgb.shape == (32, 16, 3)
    assert batch.masks.shape == (32, 1)
    assert batch.rays.origins.shape == (32, 3)
    test_ds = datasets.load_dataset("test", transient_dir, config)
    eval_batch = test_ds.generate_ray_batch(0)
    assert eval_batch.rgb.shape == (64, 16, 3)


def test_fwp_transient_loader(transient_dir):
    # Add per-frame 'camera' intrinsics required by the FWP format.
    with open(os.path.join(transient_dir, "transforms_train.json")) as f:
        meta = json.load(f)
    K = np.array([[9.6, 0, 4.0], [0, 9.6, 4.0], [0, 0, 1.0]])
    for fr in meta["frames"]:
        fr["camera"] = (K * (512 / 8)).tolist()  # stored at 512 scale
    for split in ("train", "test"):
        with open(os.path.join(transient_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    config = Config(
        dataset_loader="fwp_transient_captured", near=0.1, far=5.0, batch_size=16,
        use_transient=True, n_bins=16, start_bin=0, height=8, width=8,
        test_height=8, test_width=8, vis_only=True, dataset_scale=2.0,
        light_source_position=[0.1, 0.2, 0.3], light_static_wrt_camera=True,
        mask_threshold=0.0,
    )
    ds = datasets.load_dataset("train", transient_dir, config)
    batch = ds.next_train()
    assert batch.rgb.shape == (16, 16, 3)
    assert np.isfinite(batch.rays.lights).all()


def test_env_map_tables():
    rgb = np.abs(np.random.RandomState(0).rand(16, 32, 3)).astype(np.float32)
    tables = env_maps.build_env_map_tables(rgb)
    assert tables["env_map"].shape == (1, 512, 1, 3)
    pmf = tables["env_map_pmf"]
    np.testing.assert_allclose(pmf.sum(), 1.0, rtol=1e-5)
    dirs = tables["env_map_dirs"].reshape(-1, 3)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)


def test_llff_poses_bounds(tmp_path_factory):
    d = tmp_path_factory.mktemp("llff")
    n, res = 6, 8
    poses_hwf = np.zeros((n, 3, 5))
    for i in range(n):
        poses_hwf[i, :, :4] = _pose(i, n)
        poses_hwf[i, :, 4] = [res, res, 10.0]
    arr = np.concatenate(
        [poses_hwf.reshape(n, -1), np.tile([[1.0, 10.0]], (n, 1))], axis=1
    )
    np.save(str(d / "poses_bounds.npy"), arr)
    os.makedirs(d / "images")
    for i in range(n):
        _write_png(str(d / "images" / f"img_{i}.png"),
                   np.random.RandomState(i).rand(res, res, 3))
    config = Config(dataset_loader="llff", near=0.1, far=5.0, batch_size=8,
                    llff_load_from_poses_bounds=True, llffhold=3,
                    linear_to_srgb=True)
    ds = datasets.load_dataset("train", str(d), config)
    assert ds.images.shape[0] == 4  # 6 images, every 3rd held out
    batch = ds.next_train()
    assert batch.rgb.shape == (8, 3)


def test_pose_math_roundtrip():
    poses = camera_utils.generate_spherical_poses(5, radius=3.0, seed=1)
    recentered, tform = camera_utils.recenter_poses(poses)
    back = camera_utils.unpad_poses(
        np.linalg.inv(tform) @ camera_utils.pad_poses(recentered)
    )
    np.testing.assert_allclose(back, poses, atol=1e-5)
    pca, _ = camera_utils.transform_poses_pca(poses)
    assert np.abs(pca[:, :3, 3]).max() <= 1.0 + 1e-5


def test_bundle_rays_roundtrip(transient_dir, tmp_path):
    """bundle.py produces the train_efficient stream the transient loader reads."""
    import bundle

    out = str(tmp_path / "train_efficient")
    bundle.bundle_rays(transient_dir, out,
                       os.path.join(transient_dir, "transforms_train.json"))
    import h5py

    with h5py.File(os.path.join(out, "samples.h5")) as f:
        samples = np.array(f["dataset"])
    with h5py.File(os.path.join(out, "x.h5")) as f:
        xs = np.array(f["dataset"]).astype(int)
    with h5py.File(os.path.join(out, "file_indices.h5")) as f:
        fi = np.array(f["dataset"]).astype(int)
    assert samples.shape[0] == 3 * 8 * 8  # n_frames * H * W
    assert samples.shape[-1] == 3
    assert xs.max() < 8 and fi.max() < 3
    # Spot-check one entry against the source frame.
    with h5py.File(os.path.join(out, "y.h5")) as f:
        ys = np.array(f["dataset"]).astype(int)
    from neural_radiance_caching_tpu.data.io import read_h5

    frame = read_h5(os.path.join(transient_dir, "frames", f"r_{fi[0]}.h5"))
    np.testing.assert_allclose(samples[0], frame[ys[0], xs[0], :, :3], atol=1e-6)


def test_fipt_synthetic_loader(tmp_path):
    d = tmp_path / "fipt"
    os.makedirs(d / "train")
    res, n = 8, 2
    meta = _transforms(n, res)
    for f in meta["frames"]:
        f["file_path"] = f["file_path"].replace("train/", "train/im_")
    with open(d / "train" / "transforms.json", "w") as fp:
        json.dump(meta, fp)
    for i in range(n):
        _write_png(str(d / "train" / f"im_r_{i}.png"),
                   np.random.RandomState(i).rand(res, res, 3))
    config = Config(dataset_loader="fipt_synthetic", near=0.1, far=5.0,
                    batch_size=8, linear_to_srgb=False, use_exrs=False)
    ds = datasets.load_dataset("train", str(d), config)
    batch = ds.next_train()
    assert batch.rgb.shape == (8, 3)
    assert np.isfinite(batch.rays.origins).all()


def test_fipt_real_cam_parsing(tmp_path):
    from neural_radiance_caching_tpu.data.datasets import read_cam_params_fipt

    cams = []
    rng = np.random.RandomState(0)
    for _ in range(3):
        origin = rng.randn(3)
        at = origin + rng.randn(3)
        up = np.cross(at - origin, rng.randn(3))
        up = up / np.linalg.norm(up)
        cams.append(np.stack([origin, at, up]).T)  # stored transposed rows
    lines = ["3"]
    for c in cams:
        for row in c:
            lines.append(" ".join(str(v) for v in row))
    p = tmp_path / "cam.txt"
    p.write_text("\n".join(lines))
    parsed = read_cam_params_fipt(str(p))
    assert len(parsed) == 3 and parsed[0].shape == (3, 3)


def test_tat_nerfpp_loader(tmp_path):
    d = tmp_path / "tat"
    res, n = 8, 3
    for sub in ("pose", "intrinsics", "rgb"):
        os.makedirs(d / "train" / sub)
    K = np.eye(4); K[0, 0] = K[1, 1] = 10.0; K[0, 2] = K[1, 2] = res / 2
    for i in range(n):
        pose = np.eye(4); pose[:3, :4] = _pose(i, n)
        np.savetxt(d / "train" / "pose" / f"{i:04d}.txt", pose)
        np.savetxt(d / "train" / "intrinsics" / f"{i:04d}.txt", K)
        _write_png(str(d / "train" / "rgb" / f"{i:04d}.png"),
                   np.random.RandomState(i).rand(res, res, 3))
    config = Config(dataset_loader="tat_nerfpp", near=0.1, far=5.0, batch_size=8,
                    linear_to_srgb=True)
    ds = datasets.load_dataset("train", str(d), config)
    batch = ds.next_train()
    assert batch.rgb.shape == (8, 3)
    assert np.isfinite(batch.rays.directions).all()


def test_transform_poses_focus():
    poses = camera_utils.generate_spherical_poses(6, radius=3.0, seed=2)
    out, tform = camera_utils.transform_poses_focus(poses)
    # The focus point (origin of the new frame) is near the scene center.
    assert np.linalg.norm(out[:, :3, 3], axis=-1).max() < 5.0
    back = camera_utils.unpad_poses(
        np.linalg.inv(tform) @ camera_utils.pad_poses(out))
    np.testing.assert_allclose(back, poses, atol=1e-4)


def test_rtmv_loader(tmp_path):
    from neural_radiance_caching_tpu.data import exr

    d = tmp_path / "rtmv"
    os.makedirs(d)
    res, n = 8, 2
    rng = np.random.RandomState(0)
    for i in range(n):
        img = rng.rand(res, res, 4).astype(np.float32)
        exr.write_exr(str(d / f"{i:05d}.exr"), img)
        pose = np.eye(4); pose[:3, :4] = _pose(i, n)
        meta = {"camera_data": {
            "cam2world": pose.T.tolist(),
            "intrinsics": {"fx": 10.0, "fy": 10.0, "cx": res / 2, "cy": res / 2},
        }}
        with open(d / f"{i:05d}.json", "w") as f:
            json.dump(meta, f)
    config = Config(dataset_loader="rtmv", near=0.1, far=5.0, batch_size=8,
                    linear_to_srgb=True)
    ds = datasets.load_dataset("train", str(d), config)
    batch = ds.next_train()
    assert batch.rgb.shape == (8, 3)
    assert np.isfinite(batch.rgb).all()


def test_exr_codec_roundtrip_and_zip(tmp_path):
    import struct
    import zlib

    from neural_radiance_caching_tpu.data import exr

    rng = np.random.RandomState(3)
    # Quantized values so the zlib block is genuinely smaller than raw
    # (OpenEXR stores raw when compression does not shrink a block, and the
    # reader distinguishes the two by size).
    img = (rng.randint(0, 4, (9, 5, 3)) / 4.0).astype(np.float32)
    p = str(tmp_path / "a.exr")
    exr.write_exr(p, img)
    np.testing.assert_array_equal(exr.read_exr(p), img)

    # Half-precision channels read back within half tolerance.
    raw = open(p, "rb").read()

    # ZIPS-compressed variant: apply the EXR predictor (interleave + delta)
    # and zlib per scanline, rewrite the file, and check the reader's
    # decompression path inverts it exactly.
    def exr_zip(data):
        arr = np.frombuffer(data, np.uint8)
        half = (len(arr) + 1) // 2
        inter = np.concatenate([arr[0::2], arr[1::2]])
        d = inter.astype(np.int64)
        delta = np.concatenate([d[:1], (d[1:] - d[:-1] + 128 + 256) % 256])
        return zlib.compress(delta.astype(np.uint8).tobytes())

    # Parse our own uncompressed file and re-emit with ZIPS.
    h, w, c = img.shape
    # header ends at the offset table; find it by re-deriving sizes
    magic, version = struct.unpack_from("<ii", raw, 0)
    pos = 8
    header = {}
    while raw[pos] != 0:
        e = raw.index(b"\x00", pos); name = raw[pos:e].decode(); pos = e + 1
        e = raw.index(b"\x00", pos); pos = e + 1
        size, = struct.unpack_from("<i", raw, pos); pos += 4
        header[name] = (pos, size); pos += size
    pos += 1
    line_bytes = w * 4 * c
    new = bytearray(raw[: header["compression"][0]])
    new += b"\x02"  # ZIPS
    new += raw[header["compression"][0] + 1 : pos]
    blocks = []
    for y in range(h):
        off = pos + 8 * h + y * (8 + line_bytes)
        data = raw[off + 8 : off + 8 + line_bytes]
        z = exr_zip(data)
        blocks.append(struct.pack("<ii", y, len(z)) + z)
    offs, cur = [], len(new) + 8 * h
    for b in blocks:
        offs.append(cur); cur += len(b)
    new += struct.pack(f"<{h}q", *offs) + b"".join(blocks)
    p2 = str(tmp_path / "b.exr")
    open(p2, "wb").write(bytes(new))
    np.testing.assert_array_equal(exr.read_exr(p2), img)


def test_colmap_binary_roundtrip(tmp_path):
    """Write a spec-conformant cameras.bin/images.bin pair and parse it."""
    import struct

    from neural_radiance_caching_tpu.data import colmap

    d = tmp_path / "scene" / "sparse" / "0"
    os.makedirs(d)
    # cameras.bin: one PINHOLE camera.
    with open(d / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 8, 6))
        f.write(struct.pack("<4d", 10.0, 11.0, 4.0, 3.0))
    # images.bin: two images with identity-ish poses.
    with open(d / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in ((1, b"b.png"), (2, b"a.png")):
            f.write(struct.pack("<idddddddi", i, 1.0, 0, 0, 0, 0.1 * i, 0, 0, 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))  # one 2D point (24 bytes)
    names, poses, pixtocams, dist, camtype = colmap.load_colmap_posedata(
        str(tmp_path / "scene")
    )
    assert names == ["a.png", "b.png"]  # sorted by name
    assert poses.shape == (2, 3, 4) and np.isfinite(poses).all()
    # Intrinsics invert correctly: pixtocam @ K = I.
    K = camera_utils.intrinsic_matrix(10.0, 11.0, 4.0, 3.0)
    np.testing.assert_allclose(pixtocams[0] @ K, np.eye(3), atol=1e-6)
    assert dist is None
    # Identity rotation w2c with t=(0.2,0,0) -> camera origin at -0.2.
    np.testing.assert_allclose(poses[0][:, 3], [-0.2, 0, 0], atol=1e-6)


def test_raw_utils_demosaic_and_affine():
    from neural_radiance_caching_tpu.data import raw_utils

    # A constant-color scene must demosaic to itself.
    rgb = np.array([0.2, 0.5, 0.8], np.float32)
    h = w = 8
    bayer = np.zeros((h, w), np.float32)
    bayer[0::2, 0::2] = rgb[0]
    bayer[0::2, 1::2] = rgb[1]
    bayer[1::2, 0::2] = rgb[1]
    bayer[1::2, 1::2] = rgb[2]
    out = raw_utils.bilinear_demosaic(bayer)
    assert out.shape == (h, w, 3)
    np.testing.assert_allclose(out[2:-2, 2:-2], np.broadcast_to(rgb, out[2:-2, 2:-2].shape), atol=1e-6)

    # Bayer mask covers each pixel exactly once.
    px, py = np.meshgrid(np.arange(4), np.arange(4), indexing="xy")
    mask = raw_utils.pixels_to_bayer_mask(px, py)
    np.testing.assert_array_equal(mask.sum(-1), np.ones_like(mask.sum(-1)))

    # Affine matching inverts a known affine map.
    rng = np.random.RandomState(0)
    gt = rng.rand(16, 16, 3)
    est = gt * 2.5 + 0.3
    matched = raw_utils.match_images_affine(est, gt)
    np.testing.assert_allclose(matched, gt, atol=1e-6)

    # postprocess_raw maps the exposure level to white.
    raw = np.full((4, 4, 3), 0.5, np.float32)
    srgb = raw_utils.postprocess_raw(raw, np.eye(3), exposure=0.5)
    np.testing.assert_allclose(srgb, np.ones_like(srgb), atol=1e-6)


def test_procrustes_alignment_recovers_similarity():
    from neural_radiance_caching_tpu.data import alignment

    rng = np.random.RandomState(0)
    gt = camera_utils.generate_spherical_poses(8, radius=3.0, seed=5)
    # Apply a known similarity: rotation about z + scale + translation.
    th = 0.7
    rot = np.array([[np.cos(th), -np.sin(th), 0],
                    [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    scale, trans = 1.8, np.array([0.3, -0.2, 1.1])
    opt = gt.copy()
    opt[:, :3, :3] = rot @ gt[:, :3, :3]
    opt[:, :3, 3] = scale * (gt[:, :3, 3] @ rot.T) + trans

    test_gt = camera_utils.generate_spherical_poses(4, radius=3.0, seed=6)
    aligned_train, aligned_test = alignment.compute_procrustes_aligned_poses(
        opt, gt, test_gt)
    # Train GT poses land exactly on the optimized poses.
    np.testing.assert_allclose(aligned_train[:, :3, 3], opt[:, :3, 3], atol=1e-5)
    np.testing.assert_allclose(aligned_train[:, :3, :3], opt[:, :3, :3], atol=1e-5)
    # Test poses receive the same transform.
    expected = scale * (test_gt[:, :3, 3] @ rot.T) + trans
    np.testing.assert_allclose(aligned_test[:, :3, 3], expected, atol=1e-5)


# --- PixelRig / Aerial / PreloadedData (open SfM-camera encoding) ----------------


def _write_sfm_camera(path, focal, ppx, ppy, cam_from_world, aspect=1.0,
                      size=None, as_npz=False, invert_key=False):
    fields = {
        "focal_length": focal,
        "pixel_aspect_ratio": aspect,
        "principal_point_x": ppx,
        "principal_point_y": ppy,
    }
    if size is not None:
        fields["image_size_x"], fields["image_size_y"] = size
    key = "world_from_camera" if invert_key else "camera_from_world"
    mat = np.linalg.inv(cam_from_world) if invert_key else cam_from_world
    if as_npz:
        np.savez(path, **fields, **{key: mat})
    else:
        with open(path, "w") as f:
            json.dump({**fields, key: np.asarray(mat).tolist()}, f)


def _rig_cam_from_world(i):
    m = np.eye(4)
    m[:3, 3] = [0.05 * i, -0.03 * i, 0.02 * i]
    return m


def test_pixelrig_loader_casts_ndc_rays(tmp_path):
    res, n = 8, 3
    img_dir = tmp_path / "scaled_images"
    cam_dir = tmp_path / "scaled_camera_pose"
    os.makedirs(img_dir)
    os.makedirs(cam_dir)
    rng = np.random.RandomState(0)
    for i in range(n):
        _write_png(str(img_dir / f"im_{i}.png"), rng.rand(res, res, 3))
        _write_sfm_camera(
            str(cam_dir / f"cam_{i}.json"), focal=10.0, ppx=res / 2,
            ppy=res / 2, cam_from_world=_rig_cam_from_world(i),
            as_npz=False, invert_key=(i % 2 == 1),
        )
    # npz alternative of the same encoding must parse identically.
    _write_sfm_camera(str(tmp_path / "cam.npz"), 10.0, 4.0, 4.0,
                      _rig_cam_from_world(1), as_npz=True)
    cam = datasets._read_sfm_camera(str(tmp_path / "cam.npz"))
    assert cam["focal_length"] == 10.0

    config = Config(dataset_loader="pixelrig", near=1.0, far=100.0,
                    batch_size=8)
    ds = datasets.load_dataset("train", str(img_dir), config)
    assert (ds.near, ds.far) == (0.0, 1.0)  # NDC bounds
    assert ds.pixtocam_ndc is not None
    assert ds.render_poses.shape == (config.render_path_frames, 3, 4)
    batch = ds.next_train()
    # NDC rays: every origin sits exactly on the z = -1 near plane and
    # directions span to the +1 far plane.
    np.testing.assert_allclose(batch.rays.origins[..., 2], -1.0, atol=1e-5)
    np.testing.assert_allclose(batch.rays.directions[..., 2], 2.0, atol=1e-5)
    assert np.isfinite(batch.rays.radii).all() and (batch.rays.radii > 0).all()
    np.testing.assert_allclose(batch.rays.near, 0.0)
    np.testing.assert_allclose(batch.rays.far, 1.0)


def test_pixelrig_proto_file_raises(tmp_path):
    with open(tmp_path / "cam.pb", "wb") as f:
        f.write(b"\x0a\x14\x08\x01\x12\x00")  # binary proto-ish bytes
    with pytest.raises(NotImplementedError, match="vision_sfm"):
        datasets._read_sfm_camera(str(tmp_path / "cam.pb"))


def test_aerial_loader_split_and_scale(tmp_path):
    res, n = 8, 4
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "cameras")
    rng = np.random.RandomState(1)
    for i in range(n):
        _write_png(str(tmp_path / "rgb" / f"{i:03d}.png"),
                   rng.rand(res, res, 3))
        _write_sfm_camera(
            str(tmp_path / "cameras" / f"{i:03d}.json"), focal=9.0,
            ppx=res / 2, ppy=res / 2, cam_from_world=_rig_cam_from_world(i + 1),
        )
    config = Config(dataset_loader="aerial", near=0.1, far=10.0, batch_size=8,
                    llffhold=2, world_scale=2.0)
    train = datasets.load_dataset("train", str(tmp_path), config)
    test = datasets.load_dataset("test", str(tmp_path), config)
    assert train.images.shape[0] == 2 and test.images.shape[0] == 2
    # world_scale divides camera positions: image 1 went to the train split.
    expected = np.linalg.inv(_rig_cam_from_world(2))[:3, 3] / 2.0
    np.testing.assert_allclose(train.camtoworlds[0, :3, 3], expected,
                               atol=1e-6)
    batch = train.next_train()
    assert np.isfinite(batch.rays.directions).all()


def test_aerial_orbit_render_path(tmp_path):
    res = 8
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "cameras")
    os.makedirs(tmp_path / "orbit_cameras")
    rng = np.random.RandomState(2)
    for i in range(2):
        _write_png(str(tmp_path / "rgb" / f"{i}.png"), rng.rand(res, res, 3))
        _write_sfm_camera(str(tmp_path / "cameras" / f"{i}.json"), 9.0,
                          res / 2, res / 2, _rig_cam_from_world(i + 1))
    for i in range(3):
        _write_sfm_camera(str(tmp_path / "orbit_cameras" / f"{i}.json"), 7.0,
                          res / 2, res / 2, _rig_cam_from_world(i + 2),
                          size=(16, 12))
    config = Config(dataset_loader="aerial", near=0.1, far=10.0, batch_size=8,
                    render_path=True, world_scale=1.0)
    ds = datasets.load_dataset("train", str(tmp_path), config)
    assert ds.camtoworlds.shape[0] == 3  # orbit cameras drive the path
    # Orbit intrinsics (focal 7) replaced the capture intrinsics (focal 9).
    np.testing.assert_allclose(
        1.0 / ds.pixtocams.reshape(-1, 3, 3)[0, 0, 0], 7.0, rtol=1e-6
    )


def test_preloaded_data_arrays(tmp_path):
    res, n = 8, 2
    rng = np.random.RandomState(3)
    images = rng.rand(n, res, res, 3).astype(np.float32)
    camtoworlds = np.stack([_pose(i, n) for i in range(n)]).astype(np.float32)
    pixtocams = np.linalg.inv(
        camera_utils.intrinsic_matrix(10.0, 10.0, res / 2, res / 2)
    )[None].astype(np.float32)
    config = Config(dataset_loader="preloaded", near=0.1, far=8.0,
                    batch_size=8)
    ds = datasets.load_dataset(
        "train", None, config,
        images=images, camtoworlds=camtoworlds, pixtocams=pixtocams,
    )
    assert ds.num_images == n and ds.height == res
    batch = ds.next_train()
    assert batch.rgb.shape == (8, 3)
    assert np.isfinite(batch.rays.origins).all()


def test_synthetic_spheres_physical_shading():
    """Physical mode: GT satisfies the material model's rendering equation.

    rgb = albedo * (ENV_IRRADIANCE + LIGHT_POWER * lambert * vis / dist^2)
    with sphere-on-sphere shadows — so shadowed hit pixels are exactly
    ambient-only (albedo up to the global ENV scale) and lit pixels carry
    the inverse-square attenuated direct term. Legacy mode (the default)
    must be bit-identical to what it always produced.
    """
    cfg = Config(
        dataset_loader="synthetic_spheres",
        synthetic_spheres_shading="physical",
        compute_albedo_metrics=True,
        compute_normal_metrics=True,
        batch_size=16,
    )
    ds = datasets.SyntheticSpheres("train", None, cfg, num_images=4,
                                   resolution=64)
    cls = datasets.SyntheticSpheres
    img, alb, alpha = ds.images, ds.albedo_images, ds.alphas
    hit = alpha > 0
    assert hit.any()
    # LDR-safe: the constants keep the brightest lit pixel under 1.
    assert float(img.max()) <= 1.0
    assert float(img.min()) >= 0.0

    # Ambient-only pixels (shadowed or facing away): rgb == albedo * ENV.
    amb_only = (
        np.isclose(img, alb * cls.ENV_IRRADIANCE, atol=1e-6).all(-1) & hit
    )
    assert amb_only.sum() > 0
    # And some pixels must carry a direct term (scene is actively lit).
    lit = hit & ~amb_only
    assert lit.sum() > 0
    # Every hit pixel's shade (rgb/albedo) is >= the ambient floor.
    shade = img[hit] / np.maximum(alb[hit], 1e-6)
    assert np.all(shade >= cls.ENV_IRRADIANCE - 1e-6)
    # Direct term is bounded by the closest-approach inverse-square falloff.
    min_d2 = 1.51 ** 2  # nearest surface point to the light (sphere 1)
    assert np.all(shade <= cls.ENV_IRRADIANCE + cls.LIGHT_POWER / min_d2 + 1e-6)

    # True cast shadows exist: ambient-only pixels whose normal faces the
    # light can only come from occlusion, not orientation. Per-pixel light
    # directions would need the camera geometry; a sufficient proxy is the
    # light's direction from the scene centroid with a conservative margin.
    n = ds.normal_images
    centroid_ldir = cls.PHYSICAL_LIGHT / np.linalg.norm(cls.PHYSICAL_LIGHT)
    facing = (n[amb_only] @ centroid_ldir) > 0.3
    assert facing.sum() > 0

    # Legacy default unchanged: albedo * (AMBIENT + (1-AMBIENT)*lambert).
    cfg2 = Config(dataset_loader="synthetic_spheres", batch_size=16,
                  compute_albedo_metrics=True)
    ds2 = datasets.SyntheticSpheres("train", None, cfg2, num_images=2,
                                    resolution=32)
    hit2 = ds2.alphas > 0
    shade2 = ds2.images[hit2] / np.maximum(ds2.albedo_images[hit2], 1e-6)
    assert np.all(shade2 >= cls.AMBIENT - 1e-6)
    assert np.all(shade2 <= 1.0 + 1e-6)


def test_synthetic_spheres_bad_shading_rejected():
    cfg = Config(
        dataset_loader="synthetic_spheres",
        synthetic_spheres_shading="volumetric",
        batch_size=16,
    )
    with pytest.raises(ValueError, match="synthetic_spheres_shading"):
        datasets.SyntheticSpheres("train", None, cfg, num_images=2,
                                  resolution=16)


def test_synthetic_spheres_multi_illum_lights():
    """Multi-illum: one distinct light azimuth per view, split-phase-offset
    so test illuminants are held out; single fixed light otherwise."""
    from neural_radiance_caching_tpu.engine.configs import Config

    cfg = Config(
        dataset_loader="synthetic_spheres",
        synthetic_spheres_shading="physical",
        synthetic_spheres_multi_illum=True,
        batch_size=16,
    )
    train = datasets.SyntheticSpheres("train", None, cfg, num_images=6,
                                      resolution=16)
    test = datasets.SyntheticSpheres("test", None, cfg, num_images=6,
                                     resolution=16)
    # Each view gets its own light; all at the base radius/height.
    assert np.unique(np.round(train.lights, 4), axis=0).shape[0] == 6
    r = np.linalg.norm(train.lights[:, :2], axis=-1)
    np.testing.assert_allclose(r, r[0], rtol=1e-5)
    np.testing.assert_allclose(
        train.lights[:, 2], datasets.SyntheticSpheres.PHYSICAL_LIGHT[2]
    )
    # Held-out illuminants: no test light coincides with a train light.
    d = np.linalg.norm(
        train.lights[:, None, :] - test.lights[None, :, :], axis=-1
    )
    assert d.min() > 0.1
    # Shading actually varies with the illuminant: the same scene under
    # different lights must produce different images beyond view change.
    fixed = datasets.SyntheticSpheres(
        "train", None,
        Config(dataset_loader="synthetic_spheres",
               synthetic_spheres_shading="physical", batch_size=16),
        num_images=6, resolution=16,
    )
    assert not np.allclose(train.images, fixed.images)
    np.testing.assert_array_equal(fixed.lights,
                                  np.tile(fixed.lights[:1], (6, 1)))


def test_glossy_scene_brdf_matches_model_lobe():
    """The glossy GT tracer's specular term must equal the model's own
    microfacet lobe (ops/render_utils.get_lobe) for the same materials, so
    roughness/metalness recovery on this scene is a well-posed target."""
    import jax.numpy as jnp

    from neural_radiance_caching_tpu.engine.configs import Config
    from neural_radiance_caching_tpu.ops import render_utils

    rng = np.random.RandomState(3)
    n = 64
    # Random unit view/light dirs in the upper hemisphere of normal z+.
    def hemi(m):
        v = rng.randn(m, 3)
        v[:, 2] = np.abs(v[:, 2]) + 0.1
        return (v / np.linalg.norm(v, axis=-1, keepdims=True)).astype(np.float32)

    wo = hemi(n)  # view
    wi = hemi(n)  # light
    normal = np.tile(np.array([0.0, 0.0, 1.0], np.float32), (n, 1))
    albedo = rng.rand(n, 3).astype(np.float32)
    rough, metal = 0.27, 0.6

    cfg = Config(dataset_loader="synthetic_spheres",
                 synthetic_spheres_shading="physical_glossy", batch_size=16)
    ds = datasets.SyntheticSpheres("train", None, cfg, num_images=1,
                                   resolution=8)
    got = ds._ggx_specular(normal, wo, wi, albedo, rough, metal)

    shade_cfg = render_utils._shading_config(
        "microfacet_specular", use_brdf_correction=False,
        use_diffuseness=False, use_mirrorness=False,
        use_specular_albedo=False,
    )
    materials = {
        "albedo": jnp.asarray(albedo),
        "roughness": jnp.full((n, 1), rough),
        "F_0": jnp.full((n, 1), datasets.SyntheticSpheres.F0_DIELECTRIC),
        "metalness": jnp.full((n, 1), metal),
    }
    # get_lobe adds a samplers axis via materials[..., None, :]; feed wi/wo
    # with a singleton sample axis to match.
    want = render_utils.get_lobe(
        jnp.asarray(wi)[:, None, :], jnp.asarray(wo)[:, None, :],
        jnp.asarray(normal)[:, None, :], materials,
        brdf_correction=jnp.ones((n, 1, 2)), config=shade_cfg,
    )
    # Model mixes with mirrorness=1 in this config; specular-only compare.
    np.testing.assert_allclose(
        got, np.asarray(want)[:, 0, :], rtol=2e-4, atol=2e-5
    )
