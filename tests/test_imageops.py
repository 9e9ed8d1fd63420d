"""Multimodal image/video column operators (imageops.py)."""

from __future__ import annotations

import numpy as np

from opengxt_spark import imageops, raster


# ---------------------------------------------------------------------------
# bilinear_resize kernel
# ---------------------------------------------------------------------------


def test_identity_resize_is_bit_exact():
    img = raster.gen_pixels(7, 24, 16)
    out = imageops.bilinear_resize(img, 24, 16)
    assert out.dtype == np.uint8
    assert np.array_equal(out, img)


def test_constant_stays_constant_any_size():
    img = np.full((10, 14, 3), 173, dtype=np.uint8)
    for w, h in ((7, 5), (28, 3), (1, 1), (14, 10)):
        out = imageops.bilinear_resize(img, w, h)
        assert out.shape == (h, w, 3)
        assert (out == 173).all()


def test_downscale_2x_averages_pairs():
    # half-pixel convention at exact ratio 2: output pixel i samples
    # source 2i + 0.5 -> the mean of columns/rows (2i, 2i+1).
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (8, 12, 3)).astype(np.uint8)
    out = imageops.bilinear_resize(img, 6, 4)
    f = img.astype(np.float64)
    exp = (
        f[0::2, 0::2] + f[0::2, 1::2] + f[1::2, 0::2] + f[1::2, 1::2]
    ) / 4.0
    exp = np.clip(np.floor(exp + 0.5), 0, 255).astype(np.uint8)
    assert np.array_equal(out, exp)


def test_linear_gradient_preserved_on_upscale_interior():
    # bilinear interpolation of a linear ramp stays on the ramp away from
    # the clamped borders
    w, h = 16, 4
    ramp = np.tile(np.arange(w, dtype=np.float64) * 10.0, (h, 1))
    img = np.clip(ramp, 0, 255).astype(np.uint8)[..., None].repeat(3, axis=2)
    out = imageops.bilinear_resize(img, 32, 4).astype(np.float64)
    xs = (np.arange(32) + 0.5) * (w / 32.0) - 0.5
    exp = np.clip(np.floor(xs * 10.0 + 0.5), 0, 255)
    interior = slice(2, 30)
    assert np.abs(out[0, interior, 0] - exp[interior]).max() <= 1.0


# ---------------------------------------------------------------------------
# DataFrame plumbing
# ---------------------------------------------------------------------------


def test_resize_images_dataframe(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 12 = 0").limit(8)
    out = imageops.resize_images(imgs, 16, 16).collect()
    assert out
    for r in out:
        assert (r.w, r.h, r.fmt) == (16, 16, "rgb8")
        okey = int(r.image_id.split("_")[1])
        exp = raster.gen_pixels(okey, 16, 16)
        got = np.frombuffer(r.bytes, dtype=np.uint8).reshape(16, 16, 3)
        assert np.array_equal(got, exp)


def test_frame_sample_bytes_and_schema(spark, sf_dir):
    vids = imageops.videos_table(spark, sf_dir).limit(6)
    rows = imageops.frame_sample(vids, stride=2).collect()
    assert rows
    fsz = imageops.FRAME_W * imageops.FRAME_H * 3
    for r in rows:
        okey = int(r.image_id.split("_")[1])
        v = (okey * 7 + r.frame_idx * 13) % 256
        assert r.frame_idx % 2 == 0
        frame = np.frombuffer(r.frame, dtype=np.uint8)
        assert frame.shape == (fsz,)
        assert (frame == v).all()
        assert r.pix_sum == v * fsz


def test_frame_sample_counts(spark, sf_dir):
    vids = imageops.videos_table(spark, sf_dir)
    n = (
        imageops.frame_sample(vids, stride=2)
        .groupBy("image_id")
        .count()
        .join(vids.select("image_id", "n_frames"), "image_id")
        .selectExpr("SUM(CASE WHEN count = CAST((n_frames + 1) / 2 AS INT) "
                    "THEN 0 ELSE 1 END) AS bad")
        .collect()[0].bad
    )
    assert n == 0


# ---------------------------------------------------------------------------
# Permutation ops: flip / rotate90 / center-crop / channel stats
# ---------------------------------------------------------------------------


def test_flip_rot_crop_match_numpy(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3").limit(6)

    def decoded(df):
        return {
            r.image_id: np.frombuffer(r.bytes, dtype=np.uint8).reshape(
                r.h, r.w, 3)
            for r in df.collect()
        }

    base = decoded(imgs)
    assert base
    for name, df, ref in (
        ("flip_h", imageops.flip_images(imgs, "h"),
         {k: v[:, ::-1] for k, v in base.items()}),
        ("flip_v", imageops.flip_images(imgs, "v"),
         {k: v[::-1] for k, v in base.items()}),
        ("rot90", imageops.rotate90_images(imgs),
         {k: np.rot90(v) for k, v in base.items()}),
        ("crop", imageops.center_crop_images(imgs, 12, 10),
         {k: v[(v.shape[0] - 10) // 2:(v.shape[0] - 10) // 2 + 10,
               (v.shape[1] - 12) // 2:(v.shape[1] - 12) // 2 + 12]
          for k, v in base.items()}),
    ):
        got = decoded(df)
        assert set(got) == set(ref), name
        for k in ref:
            assert np.array_equal(got[k], ref[k]), (name, k)


def test_probe_checksum_detects_permutation(spark, sf_dir):
    # The position-weighted checksum MUST distinguish a flipped image from
    # the original (a plain pixel sum does not).
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3").limit(4)
    orig = {r.image_id: r.wsum
            for r in imageops.probe_checksums(imgs).collect()}
    flipped = {r.image_id: r.wsum
               for r in imageops.probe_checksums(
                   imageops.flip_images(imgs, "h")).collect()}
    assert orig and set(orig) == set(flipped)
    assert any(orig[k] != flipped[k] for k in orig)


def test_channel_stats_match_numpy(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3").limit(5)
    rows = imageops.channel_stats(imgs).collect()
    assert rows and len(rows) % 3 == 0
    for r in rows:
        okey = int(r.image_id.split("_")[1])
        meta = [m for m in imgs.collect() if m.image_id == r.image_id][0]
        ch = raster.gen_pixels(okey, meta.w, meta.h)[:, :, r.c].astype(
            np.int64)
        assert (r.ch_sum, r.ch_min, r.ch_max) == (
            int(ch.sum()), int(ch.min()), int(ch.max()))


# ---------------------------------------------------------------------------
# Patchify / grayscale / pad / dedup / brightness / temporal diff
# ---------------------------------------------------------------------------


def test_patchify_matches_numpy(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3").limit(4)
    metas = {r.image_id: (r.okey, r.w, r.h) for r in imgs.collect()}
    rows = imageops.patchify_images(imgs).collect()
    assert rows
    p = imageops.PATCH
    wts = np.arange(1, p * p * 3 + 1, dtype=np.int64)
    for r in rows:
        okey, w, h = metas[r.image_id]
        img = raster.gen_pixels(okey, w, h).astype(np.int64)
        blk = img[r.py * p:(r.py + 1) * p, r.px * p:(r.px + 1) * p]
        flat = blk.reshape(-1)
        assert r.psum == int(flat.sum())
        assert r.wsum == int(np.dot(flat, wts))
    # every image contributes exactly (w/p)*(h/p) patches
    from collections import Counter
    c = Counter(r.image_id for r in rows)
    for vid, (okey, w, h) in metas.items():
        assert c[vid] == (w // p) * (h // p)


def test_grayscale_and_pad_match_numpy(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3").limit(4)
    metas = {r.image_id: (r.okey, r.w, r.h) for r in imgs.collect()}
    for r in imageops.grayscale_images(imgs).collect():
        okey, w, h = metas[r.image_id]
        img = raster.gen_pixels(okey, w, h).astype(np.int64)
        lum = (299 * img[:, :, 0] + 587 * img[:, :, 1]
               + 114 * img[:, :, 2]) // 1000
        assert r.fmt == "gray8"
        got = np.frombuffer(r.bytes, dtype=np.uint8).reshape(h, w)
        assert np.array_equal(got, lum.astype(np.uint8))
    for r in imageops.pad_square_images(imgs).collect():
        okey, w, h = metas[r.image_id]
        s = max(w, h)
        assert (r.w, r.h) == (s, s)
        img = raster.gen_pixels(okey, w, h)
        ref = np.pad(img, ((0, s - h), (0, s - w), (0, 0)))
        got = np.frombuffer(r.bytes, dtype=np.uint8).reshape(s, s, 3)
        assert np.array_equal(got, ref)


def test_exact_dedup_classes(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir)
    groups = imageops.exact_dedup_images(imgs).collect()
    n_in = imgs.count()
    assert sum(g.n_copies for g in groups) == n_in
    # duplicate classes are exactly okey mod 768: spot-check one
    # multi-member group's bytes really are identical
    multi = [g for g in groups if g.n_copies > 1]
    if multi:
        canon = multi[0].canon_okey
        same = imgs.where(f"okey % 768 = {canon % 768}").collect()
        assert len(same) == multi[0].n_copies
        payloads = {bytes(r.bytes) for r in same}
        assert len(payloads) == 1


def test_brightness_filter_predicate(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3")
    kept = imageops.brightness_filter(imgs).collect()
    all_sums = {
        r.image_id: (r.lsum, r.w, r.h)
        for r in imageops.gray_checksums(
            imageops.grayscale_images(imgs)).collect()
    }
    kept_ids = {r.image_id for r in kept}
    for vid, (lsum, w, h) in all_sums.items():
        want = imageops.BRIGHT_DEN * lsum > imageops.BRIGHT_NUM * w * h
        assert (vid in kept_ids) == want
    assert 0 < len(kept_ids) < len(all_sums)  # the cut actually splits


def test_temporal_diff_matches_numpy(spark, sf_dir):
    vids = imageops.videos_table(spark, sf_dir).limit(6)
    metas = {r.image_id: (r.okey, r.n_frames) for r in vids.collect()}
    fsz = imageops.FRAME_W * imageops.FRAME_H * 3
    rows = imageops.temporal_diff(vids).collect()
    assert rows
    for r in rows:
        okey, n = metas[r.image_id]
        a = (okey * 7 + r.frame_idx * 13) % 256
        b = (okey * 7 + (r.frame_idx + 1) * 13) % 256
        assert r.diff_sum == abs(b - a) * fsz
    from collections import Counter
    c = Counter(r.image_id for r in rows)
    for vid, (okey, n) in metas.items():
        assert c[vid] == n - 1


def test_nn_resize_matches_numpy(spark, sf_dir):
    imgs = raster.images_table(spark, sf_dir).where("okey % 7 = 3").limit(5)
    metas = {r.image_id: (r.okey, r.w, r.h) for r in imgs.collect()}
    for ow, oh in ((20, 14), (16, 24), (7, 3)):
        for r in imageops.nn_resize_images(imgs, ow, oh).collect():
            okey, w, h = metas[r.image_id]
            assert (r.w, r.h) == (ow, oh)
            img = raster.gen_pixels(okey, w, h)
            iy = (np.arange(oh) * h) // oh
            ix = (np.arange(ow) * w) // ow
            got = np.frombuffer(r.bytes, dtype=np.uint8).reshape(oh, ow, 3)
            assert np.array_equal(got, img[iy][:, ix])
