"""Golden tests against the reference's shipped envmap fixtures:
the fitted 128-SG parameters must reproduce the reference's HDR envmaps
through OUR SG evaluation — end-to-end validation of the SG math and the
EXR codec against real reference data."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nefii_tpu.ops import sg
from nefii_tpu.utils import exr

REF = "/root/reference/code/envmaps"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures not mounted"
)


@pytest.mark.parametrize("name", ["envmap1", "envmap2", "envmap3"])
def test_fixture_sgs_evaluate_cleanly(name):
    """The shipped `tmp_lgtSGs_100.npy` fits are intermediate fits that do
    NOT reproduce the neighbouring EXRs (verified: corr <= 0.5 under both
    axis conventions), so there is no golden comparison to make — but they
    must load and evaluate to finite non-negative radiance through our SG
    stack, and loading them through EnvmapMaterialNetwork must round-trip."""
    lgt = np.load(os.path.join(REF, f"{name}_sg_fit", "tmp_lgtSGs_100.npy"))
    assert lgt.shape == (100, 7)
    env = np.asarray(sg.compute_envmap(jnp.asarray(lgt), 64, 128))
    assert np.isfinite(env).all() and env.min() >= 0 and env.max() > 0


def test_our_sg_fit_reproduces_reference_envmap():
    """End-to-end SG pipeline check on real reference data: fitting OUR SG
    model to the reference's envmap1.exr must reproduce it faithfully."""
    import cv2

    from nefii_tpu.scripts.fit_envmap_with_sg import fit_envmap_sg

    gt = exr.read(os.path.join(REF, "envmap1.exr"))[:, :, :3]
    gt_small = cv2.resize(gt, (128, 64), interpolation=cv2.INTER_AREA)
    # production fits run 100k iterations (reference fit_envmap_with_sg.py:
    # N_iter); 3k is enough to establish the pipeline converges on real HDR
    # data (sharp-sun envmaps approach corr ~1 only slowly)
    lgt, loss = fit_envmap_sg(gt_small, num_sgs=64, n_iter=3000, lr=3e-2, seed=0)
    env = np.asarray(sg.compute_envmap(jnp.asarray(lgt), 64, 128))
    corr = np.corrcoef(env.ravel(), gt_small.ravel())[0, 1]
    assert corr > 0.7, corr


def test_sunrise_sg128_blender_convention():
    path = os.path.join(REF, "sunrise", "sg_128.npy")
    if not os.path.exists(path):
        pytest.skip("sunrise fixture absent")
    lgt = np.load(path)
    assert lgt.shape[1] == 7
    env_b = np.asarray(
        sg.compute_envmap(jnp.asarray(lgt), 128, 256, coordinate_type="blender")
    )
    env_m = np.asarray(
        sg.compute_envmap(jnp.asarray(lgt), 128, 256, coordinate_type="mitsuba")
    )
    assert np.isfinite(env_b).all() and env_b.min() >= 0
    # conventions differ: same energy, different layout
    np.testing.assert_allclose(env_b.mean(), env_m.mean(), rtol=0.2)
    assert np.abs(env_b - env_m).max() > 1e-3


def test_material_network_loads_reference_light_fit():
    import jax

    from nefii_tpu.models.material import EnvmapMaterialNetwork

    net = EnvmapMaterialNetwork(num_lgt_sgs=128, multires=2, dims=(16,),
                               num_base_materials=1)
    params = net.init_params(jax.random.PRNGKey(0))
    params = net.load_light(params, os.path.join(REF, "envmap1_sg_fit", "tmp_lgtSGs_100.npy"))
    lgt = net.get_lgtSGs(params)
    assert lgt.shape == (100, 7)
    assert bool(jnp.all(jnp.abs(lgt[:, 3]) > 0))


@pytest.mark.parametrize("name", ["envmap1", "envmap2", "envmap3"])
def test_piz_decode_reference_fit_exr(name):
    """The shipped `tmp_envmap_100.exr` fit snapshots are PIZ-compressed
    (the one compression the freeimage plugin emitted that ZIP readers
    cannot touch) — decode them and check decoder-correctness invariants.
    The snapshot is an SG render from a DIFFERENT fit step than the
    sibling .npy (all three artifacts pairwise disagree), so no exact
    golden exists; instead assert: (a) shape/finite/HDR-range sanity,
    (b) the 8 independently-decoded 32-line PIZ blocks stitch seamlessly
    (a block-level decode bug shows up as discontinuities at row
    multiples of 32), and (c) the pole row (phi=0, where every SG render
    of this scene is near-constant and step-independent) matches OUR SG
    render of the sibling .npy to sub-1e-2."""
    img = exr.read(os.path.join(REF, f"{name}_sg_fit", "tmp_envmap_100.exr"))
    assert img.shape == (256, 512, 3)
    assert np.isfinite(img).all() and img.min() >= 0 and 1.0 < img.max() < 100.0

    row_diff = np.abs(np.diff(img, axis=0)).mean((1, 2))
    seams = row_diff[31::32]
    others = np.delete(row_diff, np.arange(31, len(row_diff), 32))
    assert seams.mean() < 2.0 * others.mean()

    lgt = np.load(os.path.join(REF, f"{name}_sg_fit", "tmp_lgtSGs_100.npy"))
    env = np.asarray(sg.compute_envmap(jnp.asarray(lgt), 256, 512))
    assert np.abs(img[0] - env[0]).max() < 1e-2


def test_piz_wavelet_roundtrip():
    """Our wav2 inverse must exactly invert OpenEXR's forward wavelet
    (wav2Encode, re-implemented here from ImfWav.cpp) for both the 14-bit
    and the mod-2^16 variants, including odd-size remainder paths."""
    from nefii_tpu.utils.exr import _wav2_decode

    def wenc14(a, b):
        as_ = a.astype(np.int16).astype(np.int32)
        bs = b.astype(np.int16).astype(np.int32)
        ms = ((as_ + bs) >> 1).astype(np.int16)
        ds = (as_ - bs).astype(np.int16)
        return ms.astype(np.uint16), ds.astype(np.uint16)

    def wenc16(a, b):
        ao = (a.astype(np.int64) + 0x8000) & 0xFFFF
        bo = b.astype(np.int64)
        m = (ao + bo) >> 1
        d = ao - bo
        m = np.where(d < 0, (m + 0x8000) & 0xFFFF, m)
        d = d & 0xFFFF
        return m.astype(np.uint16), d.astype(np.uint16)

    def wav2_encode(a, max_value):
        enc = wenc14 if max_value < (1 << 14) else wenc16
        ny, nx = a.shape
        n = min(nx, ny)
        p, p2 = 1, 2
        while p2 <= n:
            ys = np.arange(0, ny - p2 + 1, p2)
            xs = np.arange(0, nx - p2 + 1, p2)
            Y, X = np.meshgrid(ys, xs, indexing="ij")
            i00, i01 = enc(a[Y, X], a[Y, X + p])
            i10, i11 = enc(a[Y + p, X], a[Y + p, X + p])
            r00, r10 = enc(i00, i10)
            r01, r11 = enc(i01, i11)
            a[Y, X], a[Y, X + p] = r00, r01
            a[Y + p, X], a[Y + p, X + p] = r10, r11
            if (nx & p) and len(ys):
                x = xs[-1] + p2 if len(xs) else 0
                t0, t1 = enc(a[ys, x], a[ys + p, x])
                a[ys, x], a[ys + p, x] = t0, t1
            if (ny & p) and len(xs):
                y = ys[-1] + p2 if len(ys) else 0
                t0, t1 = enc(a[y, xs], a[y, xs + p])
                a[y, xs], a[y, xs + p] = t0, t1
            p = p2
            p2 <<= 1

    rng = np.random.default_rng(3)
    for shape in [(32, 512), (16, 16), (7, 13), (33, 65), (1, 9), (5, 1)]:
        for mx in (1000, 40000):  # 14-bit and 16-bit variants
            orig = rng.integers(0, mx + 1, shape).astype(np.uint16)
            buf = orig.copy()
            wav2_encode(buf, mx)
            _wav2_decode(buf, mx)
            np.testing.assert_array_equal(buf, orig, err_msg=f"{shape} mx={mx}")


def test_rle_roundtrip():
    """OpenEXR RLE codec: decode must invert a spec-faithful encoder
    (signed count byte; negative = literals, non-negative = run of n+1)."""
    from nefii_tpu.utils.exr import _rle_decompress

    def rle_compress(data: bytes) -> bytes:
        out = bytearray()
        i, n = 0, len(data)
        while i < n:
            run = 1
            while i + run < n and data[i + run] == data[i] and run < 127:
                run += 1
            if run >= 2:
                out += bytes([run - 1, data[i]])
                i += run
            else:
                j = i + 1
                while (
                    j < n and j - i < 127
                    and not (j + 1 < n and data[j] == data[j + 1])
                ):
                    j += 1
                out += bytes([256 - (j - i)]) + data[i:j]
                i = j
        return bytes(out)

    rng = np.random.default_rng(5)
    for payload in (
        b"\x00" * 500,
        rng.integers(0, 256, 300).astype(np.uint8).tobytes(),
        rng.integers(0, 3, 400).astype(np.uint8).tobytes(),  # runs + literals
    ):
        assert _rle_decompress(rle_compress(payload)) == payload


def test_pxr24_decode_roundtrip(tmp_path):
    """PXR24 decode must invert a spec-faithful encoder (zlib over per-row
    per-channel byte planes of horizontally delta-coded samples, FLOAT
    truncated to its top 24 bits — ImfPxr24Compressor.cpp), driven through
    a complete EXR file."""
    import struct
    import zlib

    rng = np.random.default_rng(7)
    H, W = 21, 33
    img = (rng.random((H, W, 3)).astype(np.float32) * 10).astype(np.float32)

    def pxr24_block(rows):  # rows: [n, W, 3] float32, channel order B,G,R
        parts = []
        for r in range(rows.shape[0]):
            for ci in (2, 1, 0):  # B, G, R = alphabetical channel order
                bits = rows[r, :, ci].view(np.uint32)
                pix24 = (bits >> 8).astype(np.uint32)  # truncate (no rounding)
                prev = np.concatenate([[np.uint32(0)], pix24[:-1]])
                diff = (pix24 - prev).astype(np.uint32)
                for shift in (16, 8, 0):
                    parts.append(((diff >> shift) & 0xFF).astype(np.uint8).tobytes())
        raw = b"".join(parts)
        return zlib.compress(raw)

    # assemble a minimal EXR with compression=5 (PXR24), 16-line blocks
    def attr(name, typ, val):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<i", len(val)) + val)

    chlist = b""
    for n in ("B", "G", "R"):
        chlist += n.encode() + b"\0" + struct.pack("<i", exr.PT_FLOAT)
        chlist += struct.pack("<BBBB", 0, 0, 0, 0) + struct.pack("<ii", 1, 1)
    chlist += b"\0"
    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    header = exr.MAGIC + struct.pack("<i", 2)
    header += attr("channels", "chlist", chlist)
    header += attr("compression", "compression", bytes([exr.PXR24]))
    header += attr("dataWindow", "box2i", box)
    header += attr("displayWindow", "box2i", box)
    header += attr("lineOrder", "lineOrder", b"\0")
    header += attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
    header += attr("screenWindowCenter", "v2f", struct.pack("<2f", 0.0, 0.0))
    header += attr("screenWindowWidth", "float", struct.pack("<f", 1.0))
    header += b"\0"

    n_blocks = -(-H // 16)
    blocks = [pxr24_block(img[b * 16 : b * 16 + 16]) for b in range(n_blocks)]
    pos = len(header) + 8 * n_blocks
    offsets = []
    for blk in blocks:
        offsets.append(pos)
        pos += 8 + len(blk)
    path = str(tmp_path / "pxr24.exr")
    with open(path, "wb") as f:
        f.write(header)
        f.write(struct.pack(f"<{n_blocks}q", *offsets))
        for b, blk in enumerate(blocks):
            f.write(struct.pack("<ii", b * 16, len(blk)))
            f.write(blk)

    back = exr.read(path)
    # lossy: the low mantissa byte is dropped -> <= 2^-16 relative error
    np.testing.assert_allclose(back, img, rtol=2 ** -15, atol=0)


def test_exr_oversized_block_rejected(tmp_path):
    """OpenEXR writers store a block raw whenever compression doesn't shrink
    it, so a stored block larger than its raw scanline size only occurs on
    corruption — the reader must reject it cleanly instead of feeding the
    decoders an oversized stream (opaque struct/zlib errors or garbage)."""
    import struct

    path = str(tmp_path / "small.exr")
    exr.write(path, np.zeros((4, 4, 3), np.float32))  # one ZIP block
    with open(path, "rb") as f:
        data = bytearray(f.read())

    from nefii_tpu.utils.exr import _parse_header

    _, table_off = _parse_header(bytes(data))
    (boff,) = struct.unpack("<q", data[table_off : table_off + 8])
    expected = 4 * 4 * 3 * 4  # n_lines * W * bytes_per_px (fp32 RGB)
    oversize = expected + 8
    data[boff + 4 : boff + 8] = struct.pack("<i", oversize)
    data += b"\0" * oversize  # make the oversized slice materialise fully
    with open(path, "wb") as f:
        f.write(bytes(data))

    with pytest.raises(ValueError, match="corrupt EXR"):
        exr.read(path)
