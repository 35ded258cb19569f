"""Device-resident augmentation: jitted RandomResizedCrop + RandAugment.

The SURVEY stretch goal (§7 'Fused on-device RandomResizedCrop/RandAugment
as XLA ops is the stretch goal'): the host only decodes JPEGs to raw [0,1]
pixels; cropping, flipping, RandAugment, and normalization all run inside
the jitted train step on TPU, fused by XLA into the surrounding graph. This
removes the per-sample Python/TF augmentation cost entirely (and the
reference's dead `--aa` flag becomes real, on-device).

All ops are static-shape and vmapped over the batch:
  * random_resized_crop: one `jax.image.scale_and_translate` per image
    (crop + resize as a single affine resample);
  * geometric RandAugment ops (rotate/shear/translate) via bilinear
    `map_coordinates`;
  * photometric ops (brightness/contrast/color/posterize/solarize/invert/
    autocontrast/sharpness) as vector ops.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# RandomResizedCrop (inception crop semantics, on device)
# ---------------------------------------------------------------------------
def random_resized_crop(rng: jax.Array, image: jax.Array, out_size: int,
                        area_range=(0.05, 1.0),
                        ratio_range=(3 / 4, 4 / 3)) -> jax.Array:
    """image (H, W, C) float -> (out, out, C); crop+resize in ONE resample."""
    h, w = image.shape[0], image.shape[1]
    k_area, k_ratio, k_x, k_y = jax.random.split(rng, 4)
    area = jax.random.uniform(k_area, (), minval=area_range[0],
                              maxval=area_range[1]) * (h * w)
    log_r = jax.random.uniform(k_ratio, (), minval=jnp.log(ratio_range[0]),
                               maxval=jnp.log(ratio_range[1]))
    ratio = jnp.exp(log_r)
    cw = jnp.sqrt(area * ratio)
    ch = jnp.sqrt(area / ratio)
    cw = jnp.clip(cw, 8.0, w)
    ch = jnp.clip(ch, 8.0, h)
    x0 = jax.random.uniform(k_x, (), minval=0.0, maxval=1.0) * (w - cw)
    y0 = jax.random.uniform(k_y, (), minval=0.0, maxval=1.0) * (h - ch)
    scale = jnp.stack([out_size / ch, out_size / cw])
    translation = jnp.stack([-y0 * out_size / ch, -x0 * out_size / cw])
    return jax.image.scale_and_translate(
        image, (out_size, out_size, image.shape[2]), (0, 1),
        scale, translation, method="bilinear")


# ---------------------------------------------------------------------------
# RandAugment ops (images in [0, 1])
# ---------------------------------------------------------------------------
def _affine_sample(img, mat, offset):
    """Bilinear resample with 2x2 matrix + offset around the image center."""
    h, w, c = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys = yy - cy
    xs = xx - cx
    src_y = mat[0, 0] * ys + mat[0, 1] * xs + cy + offset[0]
    src_x = mat[1, 0] * ys + mat[1, 1] * xs + cx + offset[1]
    coords = jnp.stack([src_y, src_x])

    def one_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, coords, order=1, mode="constant")

    return jnp.stack([one_channel(img[..., i]) for i in range(c)], axis=-1)


def _rotate(img, mag):
    a = mag * jnp.pi / 6  # up to 30 deg at magnitude 1
    mat = jnp.array([[jnp.cos(a), -jnp.sin(a)], [jnp.sin(a), jnp.cos(a)]])
    return _affine_sample(img, mat, jnp.zeros(2))


def _shear_x(img, mag):
    # src_x = x + 0.3*mag*y
    return _affine_sample(img, jnp.array([[1.0, 0.0], [mag * 0.3, 1.0]]),
                          jnp.zeros(2))


def _shear_y(img, mag):
    # src_y = y + 0.3*mag*x
    return _affine_sample(img, jnp.array([[1.0, mag * 0.3], [0.0, 1.0]]),
                          jnp.zeros(2))


def _translate_x(img, mag):
    # timm TranslateXRel: pct = level/10 * 0.45 (auto_augment.py hparam
    # translate_pct default)
    return _affine_sample(img, jnp.eye(2),
                          jnp.array([0.0, mag * 0.45 * img.shape[1]]))


def _translate_y(img, mag):
    return _affine_sample(img, jnp.eye(2),
                          jnp.array([mag * 0.45 * img.shape[0], 0.0]))


def _brightness(img, mag):
    return jnp.clip(img * (1.0 + mag * 0.9), 0.0, 1.0)


def _contrast(img, mag):
    mean = img.mean(axis=(0, 1), keepdims=True)
    return jnp.clip((img - mean) * (1.0 + mag * 0.9) + mean, 0.0, 1.0)


def _color(img, mag):
    grey = img.mean(axis=-1, keepdims=True)
    return jnp.clip(grey + (img - grey) * (1.0 + mag * 0.9), 0.0, 1.0)


def _posterize(img, mag):
    # timm PosterizeIncreasing (the rand-...-inc1 policy): keep
    # bits = 4 - int(level/10 * 4) high bits; harsher as level rises
    bits = 4.0 - jnp.floor(jnp.abs(mag) * 4.0)
    levels = jnp.maximum(2.0 ** bits, 1.0)
    return jnp.floor(img * levels) / levels


def _solarize(img, mag):
    thresh = 1.0 - jnp.abs(mag)
    return jnp.where(img >= thresh, 1.0 - img, img)


def _solarize_add(img, mag):
    # timm SolarizeAdd: add int(level/10*110) below the fixed 128 threshold
    add = jnp.abs(mag) * 110.0 / 255.0
    return jnp.where(img < 0.5, jnp.clip(img + add, 0.0, 1.0), img)


def _invert(img, mag):
    return 1.0 - img


def _autocontrast(img, mag):
    lo = img.min(axis=(0, 1), keepdims=True)
    hi = img.max(axis=(0, 1), keepdims=True)
    return (img - lo) / jnp.maximum(hi - lo, 1e-5)


def _equalize(img, mag):
    """PIL/TF-EfficientNet histogram equalization per channel.

    Same LUT construction as the TF reference implementation timm's
    tf-style RandAugment uses (and data/pp_ops.py's TF-side op):
    step = (sum(h) - h[-1]) // 255; lut = (cumsum(h) + step//2) // step,
    shifted by one bin; identity when step == 0.
    """
    q = jnp.clip(jnp.floor(img * 255.0 + 0.5), 0.0, 255.0).astype(jnp.int32)

    def one_channel(ch):
        h = jnp.zeros((256,), jnp.int32).at[ch.reshape(-1)].add(1)
        step = (h.sum() - h[255]) // 255
        lut = (jnp.cumsum(h) + step // 2) // jnp.maximum(step, 1)
        lut = jnp.concatenate([jnp.zeros((1,), lut.dtype), lut[:-1]])
        lut = jnp.clip(lut, 0, 255)
        out = lut[ch.reshape(-1)].reshape(ch.shape)
        return jnp.where(step == 0, ch, out)

    eq = jnp.stack([one_channel(q[..., c]) for c in range(img.shape[-1])],
                   axis=-1)
    return eq.astype(img.dtype) / 255.0


def _sharpness(img, mag):
    k = jnp.asarray([[1, 1, 1], [1, 5, 1], [1, 1, 1]], jnp.float32) / 13.0
    blurred = jax.vmap(
        lambda ch: jax.scipy.signal.convolve2d(ch, k, mode="same"),
        in_axes=-1, out_axes=-1)(img)
    return jnp.clip(img + (img - blurred) * mag * 0.9, 0.0, 1.0)


# the 15 ops of timm's default 'rand-*' policy (auto_augment.py
# rand_augment_ops, increasing transforms): AutoContrast, Equalize,
# Invert, Rotate, Posterize, Solarize, SolarizeAdd, Color, Contrast,
# Brightness, Sharpness, ShearX, ShearY, TranslateXRel, TranslateYRel
_RA_OPS = (_rotate, _shear_x, _shear_y, _translate_x, _translate_y,
           _brightness, _contrast, _color, _posterize, _solarize,
           _solarize_add, _equalize, _invert, _autocontrast, _sharpness)
RA_OP_NAMES = ("Rotate", "ShearX", "ShearY", "TranslateXRel",
               "TranslateYRel", "Brightness", "Contrast", "Color",
               "Posterize", "Solarize", "SolarizeAdd", "Equalize",
               "Invert", "AutoContrast", "Sharpness")


def sample_ra_layer(rng, magnitude: float, mag_std: float,
                    num_ops: int, apply_prob: float = 0.5):
    """One RandAugment layer draw with timm's exact grammar
    (timm auto_augment.py AugmentOp.__call__ / rand_augment_ops):

      * level ~ N(magnitude, mag_std), clipped to [0, _LEVEL_DENOM=10],
        normalized to [0, 1]
      * ops are chosen uniformly; each APPLIES with prob 0.5 (the policy's
        AugmentOp prob) — returns op_idx == num_ops for the identity case
      * sign flips with prob 0.5 (timm _randomly_negate)

    Returns (op_idx, signed_mag).
    """
    k_op, k_mag, k_sign, k_apply = jax.random.split(rng, 4)
    level = magnitude + jax.random.normal(k_mag) * mag_std
    level = jnp.clip(level, 0.0, 10.0) / 10.0
    mag = level * jnp.where(jax.random.bernoulli(k_sign), 1.0, -1.0)
    op_idx = jnp.where(jax.random.bernoulli(k_apply, apply_prob),
                       jax.random.randint(k_op, (), 0, num_ops), num_ops)
    return op_idx, mag


# ---------------------------------------------------------------------------
# Batched geometric ops as separable MXU resampling
#
# map_coordinates lowers to gathers, which TPUs execute near-scalar: one
# gather-warp over a ViT-B batch costs ~8 ms on v5e. A 1-D bilinear
# resample along one axis is instead a small matmul with a weight matrix
# built from iota — MXU work at streaming rate. Shears and translations
# ARE single-axis resamples (per-row/per-column shifts), and a rotation
# decomposes into three shears (Paeth): R(a) = Hx(tan a/2)·Hy(−sin a)·
# Hx(tan a/2), applied as three resampling passes. Weight matrices depend
# only on the per-BATCH magnitude, so they are built once per step and
# shared across images and channels.
# ---------------------------------------------------------------------------
def _lerp_rows(src, n_in):
    """Bilinear 1-D resampling weights: (..., n_out) source coords ->
    (..., n_out, n_in). Coords outside [0, n_in-1] get all-zero rows,
    matching map_coordinates' mode='constant' zero fill."""
    i = jnp.arange(n_in, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - i))


def _shear_x_batch(imgs, s):
    """out(y, x) = in(y, x + s·(y−cy)) for the whole (B,H,W,C) batch."""
    _, h, w, _ = imgs.shape
    y = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    x = jnp.arange(w, dtype=jnp.float32)
    wm = _lerp_rows(x[None, :] + s * y[:, None], w)        # (H, W, W)
    return jnp.einsum("hoi,bhic->bhoc", wm.astype(imgs.dtype), imgs)


def _shear_y_batch(imgs, s):
    """out(y, x) = in(y + s·(x−cx), x)."""
    _, h, w, _ = imgs.shape
    x = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    yv = jnp.arange(h, dtype=jnp.float32)
    wm = _lerp_rows(yv[None, :] + s * x[:, None], h)       # (W, H, H)
    return jnp.einsum("woi,biwc->bowc", wm.astype(imgs.dtype), imgs)


def _translate_x_batch(imgs, frac):
    """out(y, x) = in(y, x + frac·W): one (W, W) matrix for the batch."""
    w = imgs.shape[2]
    src = jnp.arange(w, dtype=jnp.float32) + frac * w
    wm = _lerp_rows(src, w)
    return jnp.einsum("oi,bhic->bhoc", wm.astype(imgs.dtype), imgs)


def _translate_y_batch(imgs, frac):
    h = imgs.shape[1]
    src = jnp.arange(h, dtype=jnp.float32) + frac * h
    wm = _lerp_rows(src, h)
    return jnp.einsum("oi,bihc->bohc", wm.astype(imgs.dtype), imgs)


def _rotate_batch(imgs, a):
    """Paeth 3-shear rotation by angle a (same source map as _rotate):
    f1 = Hx(tan a/2), f2 = Hy(−sin a), f3 = Hx(tan a/2) applied in order
    gives source map Hx·Hy·Hx = R(a). One extra bilinear pass of blur vs
    the direct 2-D warp — irrelevant for augmentation, ~10x cheaper."""
    s1 = jnp.tan(a / 2.0)
    imgs = _shear_x_batch(imgs, s1)
    imgs = _shear_y_batch(imgs, -jnp.sin(a))
    return _shear_x_batch(imgs, s1)


# batched implementations for the geometric _RA_OPS entries (same op order
# and magnitude scaling as the per-image versions; color ops just vmap)
_RA_BATCH_GEOM = {
    _rotate: lambda ims, mag: _rotate_batch(ims, mag * jnp.pi / 6),
    _shear_x: lambda ims, mag: _shear_x_batch(ims, mag * 0.3),
    _shear_y: lambda ims, mag: _shear_y_batch(ims, mag * 0.3),
    _translate_x: lambda ims, mag: _translate_x_batch(ims, mag * 0.45),
    _translate_y: lambda ims, mag: _translate_y_batch(ims, mag * 0.45),
}


def rand_augment(rng: jax.Array, image: jax.Array, num_layers: int = 2,
                 magnitude: float = 9.0, mag_std: float = 0.5) -> jax.Array:
    """timm-style 'rand-mN-mstdS' on device. image (H, W, C) in [0, 1].

    Grammar matches timm auto_augment.py exactly (see sample_ra_layer):
    level/10 normalization, 0.5 apply-prob per layer, random sign.

    NOTE: per-image use under vmap is SLOW — vmapped lax.switch executes
    every branch (measured 11 s/step for ViT-B b128). Batched training goes
    through `rand_augment_batch` below instead.
    """
    for layer in range(num_layers):
        k_layer, rng = jax.random.split(rng)
        op_idx, mag = sample_ra_layer(k_layer, magnitude, mag_std,
                                      len(_RA_OPS))
        branches = [lambda im, f=f: f(im, mag) for f in _RA_OPS]
        branches.append(lambda im: im)  # apply-prob identity
        image = jax.lax.switch(op_idx, branches, image)
    return image


def rand_augment_batch(rng: jax.Array, images: jax.Array,
                       num_layers: int = 2, magnitude: float = 9.0,
                       mag_std: float = 0.5) -> jax.Array:
    """RandAugment with batch-level op selection.

    One (op, magnitude) draw per layer per BATCH so lax.switch stays real
    control flow (XLA executes exactly one branch at runtime). Trades
    per-image op diversity for a ~1000x step-cost reduction; per-image
    diversity still comes from RRC/flip and the per-batch re-draw each step.

    Geometric ops run as separable MXU resampling (_RA_BATCH_GEOM) rather
    than vmapped map_coordinates gathers — the per-batch magnitude makes
    the resampling matrices batch-shared, so each pass is one matmul.
    """
    def batched(f):
        if f in _RA_BATCH_GEOM:
            return _RA_BATCH_GEOM[f]
        return lambda ims, mag: jax.vmap(lambda im: f(im, mag))(ims)

    ops = [batched(f) for f in _RA_OPS]
    for layer in range(num_layers):
        k_layer, rng = jax.random.split(rng)
        op_idx, mag = sample_ra_layer(k_layer, magnitude, mag_std, len(ops))
        branches = [lambda ims, f=f: f(ims, mag) for f in ops]
        branches.append(lambda ims: ims)  # apply-prob identity
        images = jax.lax.switch(op_idx, branches, images)
    return images


def parse_aa_spec(spec: str):
    """Parse a timm AutoAugment spec like 'rand-m9-mstd0.5-inc1' into
    (num_layers, magnitude, mag_std). Parity with the reference's --aa flag
    surface (reference main.py:198) — which was dead there.

    Returns None for empty/'none' specs.
    """
    if not spec or spec in ("none", "None"):
        return None
    if not spec.startswith("rand"):
        raise ValueError(f"only RandAugment ('rand-...') specs supported, got {spec!r}")
    layers, mag, mstd = 2, 9.0, 0.5
    for part in spec.split("-")[1:]:
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m"):
            mag = float(part[1:])
        elif part.startswith("n"):
            layers = int(part[1:])
        # 'inc1'/'w0' and friends: accepted, no-op here
    return layers, mag, mstd


def color_jitter(rng: jax.Array, image: jax.Array,
                 strength: float = 0.4) -> jax.Array:
    """Per-image brightness/contrast/saturation jitter (timm --color_jitter
    semantics: factor ~ U[1-s, 1+s] per property; applied when RandAugment
    is off). Another flag the reference parses but never applies (SURVEY §5).
    """
    kb, kc, ks = jax.random.split(rng, 3)

    def factor(k):
        return jax.random.uniform(k, (), minval=1 - strength,
                                  maxval=1 + strength)

    image = jnp.clip(image * factor(kb), 0.0, 1.0)                # brightness
    mean = image.mean(axis=(0, 1), keepdims=True)
    image = jnp.clip((image - mean) * factor(kc) + mean, 0.0, 1.0)  # contrast
    grey = image.mean(axis=-1, keepdims=True)
    return jnp.clip(grey + (image - grey) * factor(ks), 0.0, 1.0)  # saturation


def random_erase(rng: jax.Array, image: jax.Array, prob: float = 0.25,
                 area_range=(0.02, 1 / 3), ratio_min: float = 0.3) -> jax.Array:
    """timm-style RandomErasing ('pixel' mode: box filled with noise).

    The reference parses --reprob/--remode/--recount but they are dead in its
    TFDS path (SURVEY §5 'stale flags'); here the op is real and on device.
    image (H, W, C), any float encoding (noise matches its std).
    """
    h, w = image.shape[0], image.shape[1]
    k_gate, k_area, k_ratio, k_y, k_x, k_noise = jax.random.split(rng, 6)
    area = jax.random.uniform(k_area, (), minval=area_range[0],
                              maxval=area_range[1]) * (h * w)
    log_r = jax.random.uniform(k_ratio, (), minval=jnp.log(ratio_min),
                               maxval=jnp.log(1 / ratio_min))
    eh = jnp.clip(jnp.sqrt(area * jnp.exp(log_r)), 1.0, h)
    ew = jnp.clip(jnp.sqrt(area / jnp.exp(log_r)), 1.0, w)
    y0 = jax.random.uniform(k_y, ()) * (h - eh)
    x0 = jax.random.uniform(k_x, ()) * (w - ew)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    in_box = ((yy >= y0) & (yy < y0 + eh) & (xx >= x0) & (xx < x0 + ew))
    noise = jax.random.normal(k_noise, image.shape, image.dtype)
    erased = jnp.where(in_box[..., None], noise, image)
    return jnp.where(jax.random.bernoulli(k_gate, prob), erased, image)


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    out_size: int = 224
    use_rrc: bool = True                 # random resized crop
    use_flip: bool = True
    randaug_layers: int = 2              # 0 disables RandAugment
    randaug_magnitude: float = 9.0
    mag_std: float = 0.5
    reprob: float = 0.0                  # RandomErasing probability
    color_jitter: float = 0.0            # used only when randaug_layers == 0
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


def augment_batch(rng: jax.Array, images: jax.Array,
                  cfg: DeviceAugConfig) -> jax.Array:
    """Raw [0,1] NHWC batch -> augmented + normalized batch, all on device.

    RRC + flip are per-image (vmapped, cheap); RandAugment op selection is
    per-batch (see rand_augment_batch).
    """
    b = images.shape[0]
    k_batch, k_ra = jax.random.split(rng)
    keys = jax.random.split(k_batch, b)

    def per_image(key, img):
        k_crop, k_flip, k_cj = jax.random.split(key, 3)
        img = img.astype(jnp.float32)
        if cfg.use_rrc:
            img = random_resized_crop(k_crop, img, cfg.out_size)
        if cfg.use_flip:
            img = jnp.where(jax.random.bernoulli(k_flip), img[:, ::-1], img)
        if cfg.color_jitter > 0 and cfg.randaug_layers == 0:
            img = color_jitter(k_cj, img, cfg.color_jitter)
        return img

    images = jax.vmap(per_image)(keys, images)
    if cfg.randaug_layers > 0:
        images = rand_augment_batch(k_ra, images, cfg.randaug_layers,
                                    cfg.randaug_magnitude, cfg.mag_std)
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    images = (images - mean) / std
    if cfg.reprob > 0:
        # erase AFTER normalization with unit-normal noise (timm 'pixel' mode)
        erase_keys = jax.random.split(jax.random.fold_in(rng, 1), b)
        images = jax.vmap(lambda kk, im: random_erase(kk, im, cfg.reprob))(
            erase_keys, images)
    return images
