"""Image texture loading + sampling (the texture-mapping extra).

The reference's extras list calls for PBRT 10.4 image texture maps and
PBRT 9.3 bump maps (/root/reference/README.md:103-106); its scene format
reserves no syntax for them, so the grammar extension mirrors the
repo's existing CHECKER/BUMP lines:

    MATERIAL 3
    RGB 1 1 1
    ...
    TEXTURE tex/wood.png          <- albedo map, multiplied into RGB
    BUMPTEX tex/height.png 0.5    <- height map, normal perturbation k

Paths resolve relative to the scene file.  Textures are decoded with
PIL, converted to float32 in [0,1] (no gamma transform — the reference
samples stb's raw 8-bit values; document-and-preserve), deduplicated by
absolute path, and downsampled only past the MAX_TEX_SIDE safety clamp.
The Pallas megakernel samples textures in-kernel from u8-packed i32
word tables up to megakernel.KTEX_MAX_SIDE / KTEX_MAX_TEXELS; larger
maps run on the fused-plane XLA engine from unreplicated (H*W, 1) f32
HBM tables (megakernel._pack_textures) at full size.  Both engines
sample the same texel values, so engine parity holds wherever the
kernel path is eligible (tests/test_textures.py::TestPallasInKernel).

Sampling is bilinear with repeat wrapping in normalized (u,v)
([0,1) maps across the image; v=0 is row 0).  ``sample_texture`` is
xp-generic so the NumPy oracle shares the exact code path.
"""

from __future__ import annotations

import numpy as np

# Safety clamp only: huge maps still load (LANCZOS-downsampled) rather
# than OOM.  The engines pick their own ceilings — the megakernel runs
# any clamped size in-kernel (VMEM-resident to 65,536 texels, HBM-
# streamed past that; megakernel.KTEX_* constants), aligned with this
# clamp; off-u8-grid or over-total scenes run on the fused-plane XLA
# engine at full size.
MAX_TEX_SIDE = 2048


def load_texture(path: str) -> np.ndarray:
    """Decode an image file -> (H, W, 3) float32 in [0,1] on the u8
    grid (values k/255 — what makes the megakernel's packed-u8 tables
    exact)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    if w > MAX_TEX_SIDE or h > MAX_TEX_SIDE:
        s = MAX_TEX_SIDE / max(w, h)
        img = img.resize(
            (max(1, round(w * s)), max(1, round(h * s))),
            Image.LANCZOS,
        )
    return np.asarray(img, dtype=np.float32) / 255.0


def sample_texture(tex, u, v, xp=None):
    """Bilinear sample with repeat wrap.  tex (H,W,3); u,v (...,) in
    texture space (any real; fractional part used).  Returns (...,3).

    Wrap-then-filter: each tap index wraps independently, so the seam
    between u=1-eps and u=0 filters across the border (PBRT 10.4
    repeat-mode behavior)."""
    if xp is None:
        import jax.numpy as jnp

        xp = jnp
    h, w = tex.shape[0], tex.shape[1]
    # continuous pixel coords, texel centers at integer+0.5
    x = u * w - 0.5
    y = v * h - 0.5
    x0f = xp.floor(x)
    y0f = xp.floor(y)
    fx = (x - x0f)[..., None]
    fy = (y - y0f)[..., None]
    x0 = xp.mod(x0f.astype(xp.int32), w)
    x1 = xp.mod(x0 + 1, w)
    y0 = xp.mod(y0f.astype(xp.int32), h)
    y1 = xp.mod(y0 + 1, h)
    t = xp.asarray(tex)
    c00 = t[y0, x0]
    c01 = t[y0, x1]
    c10 = t[y1, x0]
    c11 = t[y1, x1]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def scan_texture_lines(text):
    """Per-material (texture_path, bump_path, bump_strength) from the
    scene text — the single source for BOTH parsers (the Python parser
    and the native C++ parser's wrapper call this after their structural
    parse, so texture semantics cannot drift between them).  Returns a
    list ordered by MATERIAL id."""
    out = []
    cur = -1
    for line in text.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "MATERIAL" and len(toks) >= 2:
            cur = int(toks[1])
            while len(out) <= cur:
                out.append([None, None, 0.0])
        elif toks[0] in ("OBJECT", "CAMERA"):
            cur = -1
        elif toks[0] == "TEXTURE" and cur >= 0 and len(toks) >= 2:
            out[cur][0] = toks[1]
        elif toks[0] == "BUMPTEX" and cur >= 0 and len(toks) >= 3:
            out[cur][1] = toks[1]
            out[cur][2] = float(toks[2])
    return [tuple(row) for row in out]


def attach_textures(scene, text, base_dir="."):
    """Load TEXTURE/BUMPTEX maps referenced by ``text`` into ``scene``
    (dedup by absolute path).  No-op fields (all -1 ids, () textures)
    when the scene uses none."""
    import dataclasses
    import os

    info = scan_texture_lines(text)
    m_count = scene.materials.count
    while len(info) < m_count:
        info.append((None, None, 0.0))

    textures = []
    index = {}

    def tex_id(rel):
        if rel is None:
            return -1
        p = rel if os.path.isabs(rel) else os.path.join(base_dir, rel)
        p = os.path.abspath(p)
        if p not in index:
            index[p] = len(textures)
            textures.append(load_texture(p))
        return index[p]

    texture_ids = tuple(tex_id(t) for t, _, _ in info[:m_count])
    bump_texture_ids = tuple(tex_id(b) for _, b, _ in info[:m_count])
    strength = (
        np.asarray([s for _, _, s in info[:m_count]], dtype=np.float32)
        if any(b is not None for _, b, _ in info) else None
    )
    return dataclasses.replace(
        scene,
        materials=dataclasses.replace(
            scene.materials, bumptex_strength=strength
        ),
        textures=tuple(textures),
        texture_ids=texture_ids,
        bump_texture_ids=bump_texture_ids,
    )
