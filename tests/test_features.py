import jax
import jax.numpy as jnp
import numpy as np

from rgbdslam_v2_tpu.core.camera import Intrinsics
from rgbdslam_v2_tpu.models.orb import OrbExtractor, min_depth_map
from rgbdslam_v2_tpu.ops import fast as fast_ops
from rgbdslam_v2_tpu.ops import matching
from rgbdslam_v2_tpu.ops import orb as orb_ops

CAM = Intrinsics(fx=260.0, fy=260.0, cx=160.0, cy=120.0, width=320, height=240)


def _block_texture(seed=0, h=240, w=320, cell=16):
    rng = np.random.default_rng(seed)
    t = np.kron(
        rng.uniform(0, 1, (h // cell, w // cell)), np.ones((cell, cell))
    ).astype(np.float32)
    return jnp.asarray(t)


def test_fast_finds_rectangle_corners():
    img = np.zeros((64, 64), np.float32)
    img[20:40, 20:44] = 1.0
    corner, _ = fast_ops.fast_score(jnp.asarray(img), threshold=0.08)
    c = np.asarray(corner)
    # corners present near the 4 rectangle corners, not along flat edges/center
    def any_near(y, x, r=3):
        return c[y - r : y + r + 1, x - r : x + r + 1].any()

    assert any_near(20, 20) and any_near(20, 43) and any_near(39, 20) and any_near(39, 43)
    assert not c[28:32, 28:36].any()  # interior is flat
    assert not c[:10].any()  # background flat


def test_detect_corners_nms_and_border():
    img = _block_texture()
    score = fast_ops.detect_corners(img, threshold=0.05, border=16)
    s = np.asarray(score)
    finite = np.isfinite(s)
    assert finite.sum() > 50
    # border exclusion
    assert not finite[:16].any() and not finite[:, :16].any()
    # NMS: no two adjacent maxima
    ys, xs = np.where(finite)
    coords = set(zip(ys.tolist(), xs.tolist()))
    for y, x in list(coords)[:200]:
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if (dy or dx) and (y + dy, x + dx) in coords:
                    raise AssertionError("adjacent NMS survivors")


def test_select_keypoints_grid_spreads():
    img = _block_texture(seed=3)
    score = fast_ops.detect_corners(img, threshold=0.05)
    uv, val, valid = fast_ops.select_keypoints_grid(score, 128, grid=4)
    assert uv.shape == (128, 2)
    u = np.asarray(uv)[np.asarray(valid)]
    # keypoints spread over at least 3 of 4 horizontal quarters
    quarters = set((u[:, 0] // 80).astype(int).tolist())
    assert len(quarters) >= 3


def test_orb_descriptor_shift_invariance():
    """Descriptors at shifted locations of a shifted image should match."""
    img = _block_texture(seed=4)
    sm_uv = jnp.asarray([[100.0, 100.0], [150.0, 80.0], [200.0, 160.0], [60.0, 60.0]])
    theta1, d1 = orb_ops.describe(img, sm_uv)
    shifted = jnp.roll(img, (5, 9), axis=(0, 1))
    theta2, d2 = orb_ops.describe(shifted, sm_uv + jnp.asarray([[9.0, 5.0]]))
    ham = np.asarray(matching.descriptor_distances(d1, d2))
    diag = np.diag(ham)
    off = ham + np.eye(4) * 1e9
    assert (diag < 25).all()  # same point: low Hamming
    assert (off.min(1) > diag + 10).all()  # distinct points: far


def test_orb_descriptor_scale_support():
    """Scale-aware descriptors match across a zoom; fixed-support ones drift.

    A keypoint described with scale=s on the original image must match the
    same world point described with scale=1 on an s-times-magnified image
    (that is exactly the pyramid relationship: a level-l keypoint's patch on
    the full-res image spans s^l times the base support).
    """
    from rgbdslam_v2_tpu.ops.image import resize_bilinear

    noise = np.random.default_rng(7).uniform(0, 1, (240, 320)).astype(np.float32)
    img = orb_ops.gaussian_blur(jnp.asarray(noise), 5.0)
    s = 1.4
    # the "pyramid level" image: downscaled by s; a level keypoint's full-res
    # descriptor (scale=s) must match its level-image descriptor (scale=1)
    small = resize_bilinear(img, (int(240 / s), int(320 / s)))
    pts = jnp.asarray(
        [[110.0, 100.0], [160.0, 120.0], [200.0, 90.0], [130.0, 150.0]]
    )
    K = pts.shape[0]
    _, d_full = orb_ops.describe(img, pts, scale=jnp.full((K,), s))
    _, d_lvl = orb_ops.describe(small, pts / s, scale=jnp.ones((K,)))
    ham_scaled = np.diag(np.asarray(matching.descriptor_distances(d_full, d_lvl)))

    # fixed support (no scale compensation) across the same zoom
    _, d_full0 = orb_ops.describe(img, pts)
    ham_fixed = np.diag(np.asarray(matching.descriptor_distances(d_full0, d_lvl)))

    assert ham_scaled.mean() < ham_fixed.mean() - 20
    assert (ham_scaled < 40).all()


def test_match_descriptors_ratio_and_dedup():
    rng = np.random.default_rng(0)
    base = np.where(rng.uniform(size=(20, 256)) > 0.5, 1, -1).astype(np.int8)
    # B = permuted A with small noise; plus one ambiguous pair
    perm = rng.permutation(20)
    noise_mask = rng.uniform(size=(20, 256)) < 0.02
    b = base[perm] * np.where(noise_mask, -1, 1).astype(np.int8)
    m = matching.match_descriptors(
        jnp.asarray(base),
        jnp.ones(20, bool),
        jnp.asarray(b),
        jnp.ones(20, bool),
        max_matches=20,
        ratio=0.8,
    )
    valid = np.asarray(m.valid)
    si = np.asarray(m.src_idx)[valid]
    di = np.asarray(m.dst_idx)[valid]
    assert valid.sum() >= 18
    # all matches correct under the permutation
    assert (perm[di] == si).all()
    # one-to-one
    assert len(set(di.tolist())) == len(di)


def test_match_respects_validity():
    a = jnp.asarray(np.where(np.random.default_rng(1).uniform(size=(8, 256)) > 0.5, 1, -1).astype(np.int8))
    valid_a = jnp.asarray([True] * 4 + [False] * 4)
    m = matching.match_descriptors(a, valid_a, a, jnp.ones(8, bool), 8, ratio=1.01)
    si = np.asarray(m.src_idx)[np.asarray(m.valid)]
    assert (si < 4).all()


def test_orb_extractor_end_to_end_synthetic():
    from rgbdslam_v2_tpu.io import SyntheticWorld, render_sequence
    from rgbdslam_v2_tpu.core.frames import make_frame

    world = SyntheticWorld.create(seed=0, texture_size=256, cam=CAM)
    poses, rgbs, depths = render_sequence(world, 1, seed=2)
    f = make_frame(jnp.asarray(rgbs[0]), jnp.asarray(depths[0]), CAM)
    ext = OrbExtractor(max_keypoints=256, n_levels=3)
    kp = jax.jit(lambda g, d: ext(g, d, CAM))(f.gray, min_depth_map(f.depth, f.valid))
    n = int(kp.count())
    assert n > 150
    u = np.asarray(kp.uv)[np.asarray(kp.valid)]
    assert (u[:, 0] >= 0).all() and (u[:, 0] < 320).all()
    # xyz consistent with uv/backprojection
    k = np.asarray(kp.valid)
    z = np.asarray(kp.xyz)[k, 2]
    assert (z > 0.05).all() and (z < 10).all()
    # descriptors mostly unique
    d = np.asarray(kp.desc)[k]
    assert len(np.unique(d, axis=0)) > 0.9 * n


def test_brief_family_unrotated():
    """BRIEF (oriented=False; the reference's 'BRIEF' extractor family,
    features.cpp:115-161): theta is reported as 0, descriptors stay stable
    under pure translation, and a 90-degree rotation breaks BRIEF matches
    while steered ORB survives it (the defining family difference)."""
    img = _block_texture(seed=6)
    sm_uv = jnp.asarray([[100.0, 100.0], [150.0, 80.0], [200.0, 160.0]])
    blur = orb_ops.gaussian_blur(img, 2.0)
    patches = orb_ops.extract_patches(blur, sm_uv)
    theta_b, d_brief = orb_ops.describe_patches(patches, oriented=False)
    assert np.allclose(np.asarray(theta_b), 0.0)
    theta_o, d_orb = orb_ops.describe_patches(patches, oriented=True)
    assert not np.allclose(np.asarray(theta_o), 0.0)

    # translation: both stable
    shifted = jnp.roll(img, (5, 9), axis=(0, 1))
    p2 = orb_ops.extract_patches(orb_ops.gaussian_blur(shifted, 2.0),
                                 sm_uv + jnp.asarray([[9.0, 5.0]]))
    _, d_brief2 = orb_ops.describe_patches(p2, oriented=False)
    ham = np.diag(np.asarray(matching.descriptor_distances(d_brief, d_brief2)))
    assert (ham < 30).all()

    # 90-degree rotation about each keypoint: ORB's binned steering keeps
    # distances low; BRIEF's fixed pattern does not
    H, W = img.shape
    rot = jnp.rot90(img)  # (W, H); point (x, y) -> (y, W-1-x)
    uv_rot = jnp.stack([sm_uv[:, 1], (W - 1) - sm_uv[:, 0]], axis=-1)
    pr = orb_ops.extract_patches(orb_ops.gaussian_blur(rot, 2.0), uv_rot)
    _, d_brief_r = orb_ops.describe_patches(pr, oriented=False)
    _, d_orb_r = orb_ops.describe_patches(pr, oriented=True)
    ham_brief = np.diag(np.asarray(
        matching.descriptor_distances(d_brief, d_brief_r)))
    ham_orb = np.diag(np.asarray(
        matching.descriptor_distances(d_orb, d_orb_r)))
    assert ham_orb.mean() < ham_brief.mean() - 10


def test_brisk_descriptor_properties():
    """BRISK family (features.cpp:135-160; ops/brisk.py): 512-bit ±1
    descriptors, stable under translation, distinct across keypoints, and
    rotation-steered like ORB (90-degree rotation survives when oriented)."""
    from rgbdslam_v2_tpu.ops import brisk as brisk_ops

    img = _block_texture(seed=6)
    sm_uv = jnp.asarray([[100.0, 100.0], [150.0, 80.0], [200.0, 160.0],
                         [60.0, 60.0]])
    patches = orb_ops.extract_patches(img, sm_uv)
    theta, d1 = brisk_ops.describe_patches_brisk(patches)
    assert d1.shape == (4, 512) and d1.dtype == jnp.int8
    assert set(np.unique(np.asarray(d1)).tolist()) <= {-1, 1}

    # translation: same world points on a shifted image -> low Hamming on
    # the diagonal, far off-diagonal
    shifted = jnp.roll(img, (5, 9), axis=(0, 1))
    p2 = orb_ops.extract_patches(shifted, sm_uv + jnp.asarray([[9.0, 5.0]]))
    _, d2 = brisk_ops.describe_patches_brisk(p2)
    ham = np.asarray(matching.descriptor_distances(d1, d2))
    diag = np.diag(ham)
    off = ham + np.eye(4) * 1e9
    assert (diag < 50).all()
    assert (off.min(1) > diag + 20).all()

    # 90-degree rotation about each keypoint: oriented BRISK keeps distances
    # well below the unoriented variant (the steering works)
    H, W = img.shape
    rot = jnp.rot90(img)
    uv_rot = jnp.stack([sm_uv[:, 1], (W - 1) - sm_uv[:, 0]], axis=-1)
    pr = orb_ops.extract_patches(rot, uv_rot)
    _, dr_o = brisk_ops.describe_patches_brisk(pr, oriented=True)
    _, d1_u = brisk_ops.describe_patches_brisk(patches, oriented=False)
    _, dr_u = brisk_ops.describe_patches_brisk(pr, oriented=False)
    ham_o = np.diag(np.asarray(matching.descriptor_distances(d1, dr_o)))
    ham_u = np.diag(np.asarray(matching.descriptor_distances(d1_u, dr_u)))
    assert ham_o.mean() < ham_u.mean() - 20


def test_brisk_extractor_end_to_end():
    """OrbExtractor(descriptor='brisk') produces valid 512-bit keypoints."""
    rng = np.random.default_rng(3)
    img = _block_texture(seed=3)
    depth = jnp.asarray(
        rng.uniform(0.5, 3.0, (240, 320)).astype(np.float32))
    ex = OrbExtractor(max_keypoints=128, descriptor="brisk")
    assert ex.desc_bits == 512
    kp = ex(img, min_depth_map(depth, depth > 0), CAM)
    assert kp.desc.shape == (128, 512)
    k = np.asarray(kp.valid)
    assert k.sum() > 64
    d = np.asarray(kp.desc)[k]
    assert len(np.unique(d, axis=0)) > 0.9 * k.sum()


def test_manager_brisk_family_selected():
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.graph.manager import GraphManager

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    params = ParameterServer(dict(
        feature_extractor_type="BRISK", max_keypoints=64, tpu_max_nodes=4,
        tpu_max_edges=32, tpu_candidate_batch=2))
    m = GraphManager(cam, params)
    assert m.extractor.descriptor == "brisk"
    assert m.store.desc.shape[-1] == 512


def test_manager_brief_family_selected():
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.graph.manager import GraphManager

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    params = ParameterServer(dict(
        feature_extractor_type="BRIEF", max_keypoints=64, tpu_max_nodes=4,
        tpu_max_edges=32, tpu_candidate_batch=2))
    m = GraphManager(cam, params)
    assert m.extractor.oriented is False
    params2 = ParameterServer(dict(
        feature_extractor_type="SURF", max_keypoints=64, tpu_max_nodes=4,
        tpu_max_edges=32, tpu_candidate_batch=2))
    m2 = GraphManager(cam, params2)  # warns, falls back to ORB
    assert m2.extractor.oriented is True
    assert m2.extractor.descriptor == "brief"


def test_freak_descriptor_properties():
    """FREAK family (features.cpp:135-160; ops/freak.py): 512-bit ±1
    retinal descriptors — translation-stable, distinct across keypoints,
    rotation-steered, and decorrelated from BRISK (a different family,
    not a renamed one)."""
    from rgbdslam_v2_tpu.ops import brisk as brisk_ops
    from rgbdslam_v2_tpu.ops import freak as freak_ops

    img = _block_texture(seed=6)
    sm_uv = jnp.asarray([[100.0, 100.0], [150.0, 80.0], [200.0, 160.0],
                         [60.0, 60.0]])
    patches = orb_ops.extract_patches(img, sm_uv)
    theta, d1 = freak_ops.describe_patches_freak(patches)
    assert d1.shape == (4, 512) and d1.dtype == jnp.int8
    assert set(np.unique(np.asarray(d1)).tolist()) <= {-1, 1}

    shifted = jnp.roll(img, (5, 9), axis=(0, 1))
    p2 = orb_ops.extract_patches(shifted, sm_uv + jnp.asarray([[9.0, 5.0]]))
    _, d2 = freak_ops.describe_patches_freak(p2)
    ham = np.asarray(matching.descriptor_distances(d1, d2))
    diag = np.diag(ham)
    off = ham + np.eye(4) * 1e9
    assert (diag < 60).all()
    assert (off.min(1) > diag + 20).all()

    # 90-degree rotation: oriented steering beats unoriented
    H, W = img.shape
    rot = jnp.rot90(img)
    uv_rot = jnp.stack([sm_uv[:, 1], (W - 1) - sm_uv[:, 0]], axis=-1)
    pr = orb_ops.extract_patches(rot, uv_rot)
    _, dr_o = freak_ops.describe_patches_freak(pr, oriented=True)
    _, d1_u = freak_ops.describe_patches_freak(patches, oriented=False)
    _, dr_u = freak_ops.describe_patches_freak(pr, oriented=False)
    ham_o = np.diag(np.asarray(matching.descriptor_distances(d1, dr_o)))
    ham_u = np.diag(np.asarray(matching.descriptor_distances(d1_u, dr_u)))
    assert ham_o.mean() < ham_u.mean() - 20

    # distinct family: FREAK bits are not a permutation of BRISK bits —
    # cross-family agreement on the same patches stays near chance
    _, db = brisk_ops.describe_patches_brisk(patches)
    agree = (np.asarray(d1) == np.asarray(db)).mean()
    assert 0.3 < agree < 0.7


def test_freak_extractor_and_manager_selection():
    """OrbExtractor(descriptor='freak') yields valid 512-bit keypoints and
    feature_extractor_type=FREAK selects it (no ORB fallback)."""
    from rgbdslam_v2_tpu.config import ParameterServer
    from rgbdslam_v2_tpu.graph.manager import GraphManager

    rng = np.random.default_rng(3)
    img = _block_texture(seed=3)
    depth = jnp.asarray(
        rng.uniform(0.5, 3.0, (240, 320)).astype(np.float32))
    ex = OrbExtractor(max_keypoints=128, descriptor="freak")
    assert ex.desc_bits == 512
    kp = ex(img, min_depth_map(depth, depth > 0), CAM)
    assert kp.desc.shape == (128, 512)
    k = np.asarray(kp.valid)
    assert k.sum() > 64
    d = np.asarray(kp.desc)[k]
    assert len(np.unique(d, axis=0)) > 0.9 * k.sum()

    cam = Intrinsics(fx=130.0, fy=130.0, cx=80.0, cy=60.0,
                     width=160, height=120)
    params = ParameterServer(dict(
        feature_extractor_type="FREAK", max_keypoints=64, tpu_max_nodes=4,
        tpu_max_edges=32, tpu_candidate_batch=2))
    m = GraphManager(cam, params)
    assert m.extractor.descriptor == "freak"
    assert m.store.desc.shape[-1] == 512


def test_select_keypoints_grid_approx_matches_exact_on_cpu():
    """tpu_approx_select: approx_max_k falls back to exact selection off-TPU,
    so the flag is a no-op for CPU tests and only changes the TPU lowering.
    Distinct scores -> identical keypoint sets (order-insensitive)."""
    import numpy as np

    from rgbdslam_v2_tpu.ops.fast import select_keypoints_grid

    rng = np.random.default_rng(12)
    H, W = 64, 96
    score = np.full((H, W), -np.inf, np.float32)
    flat = rng.choice(H * W, 200, replace=False)
    score.reshape(-1)[flat] = rng.permutation(200).astype(
        np.float32)  # all distinct
    uv_e, val_e, ok_e = select_keypoints_grid(jnp.asarray(score), 32, grid=4)
    uv_a, val_a, ok_a = select_keypoints_grid(
        jnp.asarray(score), 32, grid=4, approx=True)
    se = {tuple(r) for r in np.asarray(uv_e)[np.asarray(ok_e)].tolist()}
    sa = {tuple(r) for r in np.asarray(uv_a)[np.asarray(ok_a)].tolist()}
    assert se == sa
