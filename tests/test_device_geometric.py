"""Parity tests for device-side transform1 (ops/device_geometric) against
the host PIL implementations in data/augment.py (themselves the verified
rebuild of the reference recipe, util/data.py:768-809)."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from pipnet_tpu.data import augment as ha
from pipnet_tpu.ops import device_geometric as dg


def rand_img(rng, s=64):
    return rng.integers(0, 256, (s, s, 3), dtype=np.uint8)


def warp_device(img_u8, op_idx, mag):
    op = jnp.asarray([op_idx], jnp.int32)
    m = dg.ta_affine_coeffs(op, jnp.asarray([mag], jnp.float32), img_u8.shape[0])
    out = dg.nearest_affine_warp(jnp.asarray(img_u8)[None], m)
    return np.asarray(out[0])


class TestNearestAffineParity:
    """Device nearest warp must match PIL transform(AFFINE, NEAREST) exactly
    for every TA-NoColor op (data/augment.py:_affine)."""

    @pytest.mark.parametrize("name,mag", [
        ("Identity", 0.0),
        ("ShearX", 0.3), ("ShearX", -0.5),
        ("ShearY", 0.25), ("ShearY", -0.4),
        ("TranslateX", 7.0), ("TranslateX", -16.0),
        ("TranslateY", 12.0), ("TranslateY", -3.0),
        ("Rotate", 30.0), ("Rotate", -60.0), ("Rotate", 7.5),
    ])
    def test_op(self, rng, name, mag):
        img = rand_img(rng)
        pil = Image.fromarray(img)
        host_fn = ha._space_no_color()[name][0]
        want = np.asarray(host_fn(pil, mag).convert("RGB"), np.uint8)
        got = warp_device(img, dg.GEO_NAMES.index(name), mag)
        # PIL truncates output->input coords at pixel centers; any mismatch
        # would shift whole pixels, so demand exactness
        assert np.array_equal(got, want), (
            f"{name}({mag}): {np.mean(got != want):.4f} frac mismatched")


class TestRRCResizeParity:
    """The separable triangle-filter einsum must reproduce PIL
    resize(BILINEAR, box=...) within 1 grey level (PIL uses fixed-point
    accumulation; the device path uses float)."""

    @pytest.mark.parametrize("box", [
        (0, 0, 64, 64),        # full image, identity-scale
        (3, 5, 60, 62),        # interior box, slight downscale
        (0, 0, 48, 64),        # aspect change
        (10, 2, 54, 50),       # touching right edge region
    ])
    def test_box(self, rng, box):
        x0, y0, x1, y1 = box
        out_size = 56
        img = rand_img(rng)
        want = np.asarray(
            Image.fromarray(img).resize((out_size, out_size), Image.BILINEAR,
                                        box=(x0, y0, x1, y1)), np.uint8)
        wx = dg._pil_triangle_weights(jnp.asarray([x0]), jnp.asarray([x1 - x0]),
                                      64, out_size)
        wy = dg._pil_triangle_weights(jnp.asarray([y0]), jnp.asarray([y1 - y0]),
                                      64, out_size)
        xf = jnp.asarray(img, jnp.float32)[None]
        y = jnp.einsum("boi,bihc->bohc", wy, xf)
        z = jnp.einsum("boj,bhjc->bhoc", wx, y)
        got = np.asarray(jnp.clip(jnp.floor(z + 0.5), 0, 255)[0], np.uint8)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1, f"box {box}: max diff {diff.max()}"

    def test_flip_fold(self, rng):
        """hflip-then-crop equals the mirrored weight matrix."""
        img = rand_img(rng)
        x0, y0, cw, ch, out_size = 4, 6, 55, 53, 56
        flipped = Image.fromarray(img).transpose(Image.FLIP_LEFT_RIGHT)
        want = np.asarray(flipped.resize((out_size, out_size), Image.BILINEAR,
                                         box=(x0, y0, x0 + cw, y0 + ch)),
                          np.uint8)
        wx = dg._pil_triangle_weights(jnp.asarray([64 - x0 - cw]),
                                      jnp.asarray([cw]), 64, out_size)[:, ::-1, :]
        wy = dg._pil_triangle_weights(jnp.asarray([y0]), jnp.asarray([ch]),
                                      64, out_size)
        xf = jnp.asarray(img, jnp.float32)[None]
        y = jnp.einsum("boi,bihc->bohc", wy, xf)
        z = jnp.einsum("boj,bhjc->bhoc", wx, y)
        got = np.asarray(jnp.clip(jnp.floor(z + 0.5), 0, 255)[0], np.uint8)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 1


class TestRRCBoxSampling:
    def test_boxes_valid(self):
        x, y, cw, ch = dg.sample_rrc_box(jax.random.PRNGKey(0), 512, 232)
        x, y, cw, ch = (np.asarray(v) for v in (x, y, cw, ch))
        assert (cw > 0).all() and (ch > 0).all()
        assert (x >= 0).all() and (y >= 0).all()
        assert (x + cw <= 232).all() and (y + ch <= 232).all()
        # torchvision semantics: area in [.95, 1]*S^2 for accepted tries
        area_frac = (cw.astype(float) * ch) / 232.0 ** 2
        # rounding of cw/ch moves area slightly outside the band
        assert (area_frac > 0.90).all() and (area_frac < 1.05).all()
        # aspect ratios within the sampled band (plus rounding slack)
        ar = cw / ch
        assert (ar > 0.70).all() and (ar < 1.43).all()

    def test_deterministic(self):
        a = dg.sample_rrc_box(jax.random.PRNGKey(7), 32, 232)
        b = dg.sample_rrc_box(jax.random.PRNGKey(7), 32, 232)
        for u, v in zip(a, b):
            assert np.array_equal(np.asarray(u), np.asarray(v))


class TestSampleGeometric:
    def test_distribution(self):
        op, mag = dg.sample_geometric(jax.random.PRNGKey(0), 4096)
        op, mag = np.asarray(op), np.asarray(mag)
        # all ops drawn; magnitudes bounded by each op's table max
        assert set(np.unique(op)) == set(range(len(dg.GEO_NAMES)))
        for i, n in enumerate(dg.GEO_NAMES):
            mx = dg._GEO_MAX.get(n, 0.0)
            sel = mag[op == i]
            assert np.abs(sel).max() <= mx + 1e-6
            if mx > 0:     # signed: both signs appear
                assert (sel > 0).any() and (sel < 0).any()


class TestTransform1Batch:
    def test_end_to_end(self, rng):
        base = rng.integers(0, 256, (8, 72, 72, 3), dtype=np.uint8)
        out = dg.transform1_batch(jnp.asarray(base), jax.random.PRNGKey(3), 68)
        out = np.asarray(out)
        assert out.shape == (8, 68, 68, 3)
        assert out.min() >= 0 and out.max() <= 255
        assert np.array_equal(out, np.round(out))   # on the u8 lattice
        # images differ across the batch (independent augmentations)
        assert len({out[i].tobytes() for i in range(8)}) == 8


class TestRandomAffineParity:
    def test_random_ta_draws_match_pil(self, rng):
        """Property test over 24 random (op, magnitude) draws from the
        actual TA tables.  PIL's NEAREST affine quantizes coefficients to
        16.16 fixed point (Geometry.c affine_fixed), so when the rational TA
        magnitudes put sample positions exactly on integer boundaries, PIL
        samples the adjacent source pixel for entire columns/rows (e.g.
        ShearY(1/15) on a 56² image: every 15th column, ~6%).  The device
        warp uses true real-valued coordinates; any difference must be
        confined to such boundary lines."""
        import numpy as _np
        img = rand_img(rng, 56)
        pil = Image.fromarray(img)
        space = ha._space_no_color()
        r = _np.random.default_rng(11)
        fracs = []
        for _ in range(24):
            name = dg.GEO_NAMES[r.integers(len(dg.GEO_NAMES))]
            fn, bins, signed = space[name]
            mag = float(bins[r.integers(len(bins))]) if len(bins) > 1 else 0.0
            if signed and r.integers(2):
                mag = -mag
            want = np.asarray(fn(pil, mag).convert("RGB"), np.uint8)
            got = warp_device(img, dg.GEO_NAMES.index(name), mag)
            frac = np.mean(np.any(got != want, axis=-1))
            fracs.append(frac)
            assert frac <= 0.08, (name, mag, frac)   # boundary lines only
        assert np.mean(fracs) <= 0.02, np.mean(fracs)
