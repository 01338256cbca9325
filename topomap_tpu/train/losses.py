"""Training losses: ε-MSE, masked color loss, SSIM, LPIPS-style perceptual distance.

Formula-exact re-implementations of the reference losses:

* ε-MSE — the universal denoising loss (``addlrSD.py:461``).
* Masked color loss — ``multiseg_colorprompts_addlrSD_maskloss.py:54-139,567-583``:
  decode predicted x₀, build a per-sample class mask from the seg hint by prompt keyword,
  penalize masked and non-masked regions separately, total
  ``mse + 5·(loss_color + loss_stable)`` after a warmup step count.
* SSIM — the 3×3-avg-pool batch SSIM of ``vis_metrics._ssim_batch`` (``:120-161``).
* LPIPS — perceptual distance over conv features. The reference uses torchvision-pretrained
  VGG16 via the ``lpips`` package; in an air-gapped TPU pod those weights may be absent, so
  ``lpips_params`` builds the VGG16-topology feature net with either converted weights or a
  seeded random init (random-feature perceptual distances are still a valid training signal
  and deterministic for tests).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from topomap_tpu.models.nn import KeyGen, Params, conv, conv_init

# ---------------------------------------------------------------------------
# ε-MSE
# ---------------------------------------------------------------------------


def eps_mse(eps_hat: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((eps_hat.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)


# ---------------------------------------------------------------------------
# Masked color loss (maskloss script)
# ---------------------------------------------------------------------------

# Eval-style palette of the maskloss script (``maskloss.py:54-64``) — NOT the createMask
# train palette; this one includes Highway/Through_road/Tree classes.
MASKLOSS_CLASS_RGB = {
    "Building": (82, 82, 82),
    "Highway": (247, 128, 30),
    "Street_road": (149, 74, 162),
    "Through_road": (255, 103, 227),
    "River": (41, 163, 215),
    "Lake": (55, 126, 184),
    "Stream": (89, 180, 208),
    "Tree": (63, 131, 55),
    "Forest": (77, 175, 74),
}

# Keyword → class, in the reference's dict iteration order (``maskloss.py:66-76``): longer
# keys first so "Through road" wins over "Road".
MASKLOSS_KEYWORDS = [
    ("Through road", "Through_road"),
    ("Building", "Building"),
    ("Lake", "Lake"),
    ("River", "River"),
    ("Forest", "Forest"),
    ("Tree", "Tree"),
    ("Road", "Street_road"),
    ("Highway", "Highway"),
    ("Stream", "Stream"),
]


def parse_prompt_class(prompt: str) -> str | None:
    """``parse_prompt_class`` (``maskloss.py:78-84``) — first keyword hit wins."""
    for kw, cls in MASKLOSS_KEYWORDS:
        if kw in prompt:
            return cls
    return None


def prompt_class_rgb(prompts: list[str], palette: str = "reference") -> jnp.ndarray:
    """Host helper: per-prompt target RGB, or (−1,−1,−1) when no class matches (mask will
    be empty). Returns [B, 3] float32 in 0-255.

    ``palette`` selects the seg-tile color space the mask is extracted from:

    * ``"reference"`` — the maskloss script's Siegfried-style palette
      (``maskloss.py:54-64``), for reference-rendered tiles;
    * ``"synthetic"`` — the ``data/synthetic.py`` tiles, painted in the createMask
      *train* palette (``createMask.py:33-81``), whose Building is (5,5,5) not
      (82,82,82) and which has a Background class. A prompt that exactly matches a
      ``STYLE_PROMPTS`` entry resolves to the class it restyles; otherwise the
      reference keyword parse runs against the synthetic palette.
    """
    if palette == "synthetic":
        from topomap_tpu.data.synthetic import CLASS_COLORS, STYLE_PROMPTS

        kw_to_syn = {"Building": "building", "Lake": "lake", "Forest": "forest",
                     "Road": "roads", "River": "river", "Stream": "stream",
                     "Background": "background"}
        out = []
        for p in prompts:
            recolor = STYLE_PROMPTS.get(p)
            if recolor:
                (syn_cls, _), = recolor.items()
                out.append(CLASS_COLORS[syn_cls])
                continue
            cls = parse_prompt_class(p) or ("Background" if "Background" in p else None)
            syn = kw_to_syn.get(cls.replace("Street_road", "Road") if cls else "", None)
            out.append(CLASS_COLORS[syn] if syn else (-1.0, -1.0, -1.0))
        return jnp.asarray(out, jnp.float32)
    out = []
    for p in prompts:
        cls = parse_prompt_class(p)
        out.append(MASKLOSS_CLASS_RGB.get(cls, (-1.0, -1.0, -1.0)) if cls else (-1.0, -1.0, -1.0))
    return jnp.asarray(out, jnp.float32)


def extract_rgb_mask(seg: jnp.ndarray, rgb: jnp.ndarray, tolerance: float = 5.0) -> jnp.ndarray:
    """``extract_rgb_mask`` (``maskloss.py:87-101``): seg [B,H,W,3] in [0,1], rgb [B,3] in
    0-255 → float mask [B,H,W,1] where the L1 RGB distance < tolerance."""
    diff = jnp.sum(jnp.abs(seg * 255.0 - rgb[:, None, None, :]), axis=-1, keepdims=True)
    return (diff < tolerance).astype(jnp.float32)


def masked_color_losses(
    img_pred: jnp.ndarray,
    gt: jnp.ndarray,
    seg: jnp.ndarray,
    class_rgb: jnp.ndarray,
    tolerance: float = 5.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``get_masked_color_losses`` (``maskloss.py:104-139``). All images [B,H,W,3] in [0,1];
    ``class_rgb`` from :func:`prompt_class_rgb`. Returns (loss_color, loss_stable) — masked
    and non-masked MSE, each averaged over the FULL tensor (reference ``.mean()``)."""
    mask = extract_rgb_mask(seg, class_rgb, tolerance)
    sq = (img_pred - gt) ** 2
    loss_color = jnp.mean(sq * mask)
    loss_stable = jnp.mean(sq * (1.0 - mask))
    return loss_color, loss_stable


def maskloss_total(
    mse: jnp.ndarray,
    loss_color: jnp.ndarray,
    loss_stable: jnp.ndarray,
    step: jnp.ndarray,
    warmup_steps: int = 10000,
    weight: float = 5.0,
) -> jnp.ndarray:
    """``loss_total = mse`` before ``warmup_steps``, else ``mse + 5·(color+stable)``
    (``maskloss.py:575-583``) — branchless for jit."""
    extra = weight * (loss_color + loss_stable)
    return mse + jnp.where(step < warmup_steps, 0.0, extra)


# ---------------------------------------------------------------------------
# SSIM (vis_metrics._ssim_batch — 3×3 average-pool statistics)
# ---------------------------------------------------------------------------


def ssim_3x3(a: jnp.ndarray, b: jnp.ndarray, c1: float = 0.01**2, c2: float = 0.03**2) -> jnp.ndarray:
    """Batch SSIM with 3×3 mean filters over [B,H,W,C] images in [0,1]; returns scalar mean."""

    def pool(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
        ) / 9.0

    mu_a, mu_b = pool(a), pool(b)
    var_a = pool(a * a) - mu_a**2
    var_b = pool(b * b) - mu_b**2
    cov = pool(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


# ---------------------------------------------------------------------------
# LPIPS-style perceptual distance (VGG16 topology)
# ---------------------------------------------------------------------------

_VGG_PLAN = [  # (out_channels, n_convs) per stage; pool between stages — VGG16 features
    (64, 2),
    (128, 2),
    (256, 3),
    (512, 3),
    (512, 3),
]


def lpips_init(key, width_mult: float = 1.0) -> Params:
    """VGG16 feature tower + per-stage 1×1 linear heads (LPIPS 'lin' layers)."""
    kg = KeyGen(key)
    stages, heads = [], []
    c_in = 3
    for c_out, n in _VGG_PLAN:
        c_out = max(8, int(c_out * width_mult))
        convs = []
        for _ in range(n):
            convs.append(conv_init(kg(), c_in, c_out, 3))
            c_in = c_out
        stages.append(convs)
        # lpips 'lin' heads are non-negative (NetLinLayer clamps at eval) — keeps the
        # distance ≥ 0 even with random features
        head = conv_init(kg(), c_out, 1, 1)
        head["w"] = jnp.abs(head["w"])
        heads.append(head)
    return {"stages": stages, "heads": heads}


def lpips_distance(p: Params, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between [B,H,W,3] images in [0,1] (scaled to [−1,1] internally,
    LPIPS convention). Unit-normalized per-channel features, squared diff, 1×1 head, spatial
    mean, summed over stages.

    With pretrained-VGG16 params from ``utils/vgg_ckpt.py: import_vgg16_lpips`` (which add
    the lpips ScalingLayer ``shift``/``scale`` entries) this matches the reference's
    ``LPIPS(net='vgg')`` exactly (``quantitative_metrics.py:162-196``; parity-tested);
    seeded ``lpips_init`` params remain the self-contained random-feature fallback."""
    a = a * 2.0 - 1.0
    b = b * 2.0 - 1.0
    if "shift" in p:  # lpips ScalingLayer: (x - shift) / scale on [-1,1] input
        a = (a - p["shift"]) / p["scale"]
        b = (b - p["shift"]) / p["scale"]
    total = 0.0
    fa, fb = a, b
    for convs, head in zip(p["stages"], p["heads"]):
        for cp in convs:
            fa = jax.nn.relu(conv(cp, fa))
            fb = jax.nn.relu(conv(cp, fb))
        # lpips normalize_tensor: feat / (||feat||_ch + 1e-10)
        na = fa / (jnp.sqrt(jnp.sum(fa**2, -1, keepdims=True)) + 1e-10)
        nb = fb / (jnp.sqrt(jnp.sum(fb**2, -1, keepdims=True)) + 1e-10)
        d = conv(head, (na - nb) ** 2)
        total = total + jnp.mean(d, axis=(1, 2, 3))
        # stride-2 maxpool between stages
        fa = jax.lax.reduce_window(fa, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        fb = jax.lax.reduce_window(fb, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return jnp.mean(total)


def perceptual_mix_loss(mse: jnp.ndarray, lpips_val: jnp.ndarray, w_mse: float = 0.3, w_lpips: float = 0.7):
    """``0.3·mse + 0.7·lpips`` on decoded x₀ (``expand_steps_and_trainingdata.py:515-523``)."""
    return w_mse * mse + w_lpips * lpips_val
