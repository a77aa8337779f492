"""Independent scalar oracle (VERDICT r4 task 6).

Every other oracle in this repo runs ``ops/`` with ``xp=np`` — shared
code, so a bug in ``ops/`` passes its own mirror.  This module
re-derives the renderer *from the reference spec* as scalar pure-Python
/ NumPy-float64 code that imports NOTHING from ``pathtrace_tpu.ops``,
``.render`` or ``.core`` — only the package entry point, to build the
Scene fed to the integrator under test.  An 8x8 fixed-RNG frame
covering diffuse + mirror + Schlick glass + NEE is pinned against the
jnp wavefront integrator.

Spec anchors (independently re-implemented here):
* RNG: counter hash of (iter,pixel,depth,draw), top-24-bit uniform —
  the seeding discipline of makeSeededRandomEngine
  (/root/reference/src/pathtrace.cu:41-45), pcg4d-style mixing.
* Intersections: unit primitives + instance transforms with the
  reference's quirks (object-space 1e-4 back-off, world-space distance
  metric, box normal via the FORWARD transform, sphere via the
  inverse-transpose — /root/reference/src/intersections.h:26-28, 85,
  137, 142).
* Scatter: lobe policy of scatterRay (src/interactions.h:44-80) —
  Schlick-probability reflect/refract for glass, REFL-probability
  specular/diffuse split, cosine-weighted hemisphere with the
  Peter-Kutz frame (src/interactions.h:11-42).
* NEE: one uniform-by-area sample per cube light + shadow ray
  (reference README.md:107-108), diffuse-only f = albedo/pi,
  emit_ok cancellation of BSDF-sampled emission after diffuse bounces.
"""

import math
import os

import numpy as np
import pytest

import pathtrace_tpu as pt

# ---------------------------------------------------------------------------
# scalar counter RNG (reference seeding discipline; pcg4d-style mix)
# ---------------------------------------------------------------------------

M32 = 0xFFFFFFFF


def _uniform(it, pixel, depth, draw):
    a, b, c, d = it & M32, pixel & M32, depth & M32, draw & M32
    a = (a * 1664525 + 1013904223) & M32
    b = (b * 1664525 + 1013904223) & M32
    c = (c * 1664525 + 1013904223) & M32
    d = (d * 1664525 + 1013904223) & M32
    a = (a + b * d) & M32
    b = (b + c * a) & M32
    c = (c + a * b) & M32
    d = (d + b * c) & M32
    a ^= a >> 16
    b ^= b >> 16
    c ^= c >> 16
    d ^= d >> 16
    a = (a + b * d) & M32
    b = (b + c * a) & M32
    c = (c + a * b) & M32
    d = (d + b * c) & M32
    return float((a ^ d) >> 8) / 16777216.0


# draw-slot layout (fixed contract of the renderer's RNG streams)
AA_X, AA_Y = 0, 1
LOBE, DIFF_U1, DIFF_U2, FRESNEL, SPEC_U1, SPEC_U2 = 0, 1, 2, 3, 4, 5
NEE_BASE = 16

PI = math.pi
RAY_OFFSET = 1e-4
NO_HIT = 1e30
TRANSMISSION_PUSH = 5e-4
SQ13 = math.sqrt(1.0 / 3.0)


# ---------------------------------------------------------------------------
# scalar vector / transform helpers (float64 numpy length-3 arrays)
# ---------------------------------------------------------------------------

def V(x, y, z):
    return np.array([x, y, z], dtype=np.float64)


def _norm(v, eps=0.0):
    n = math.sqrt(float(v @ v))
    if eps:
        n = max(n, eps)
    return v / n


def _rot(deg, axis):
    r = math.radians(deg)
    c, s = math.cos(r), math.sin(r)
    m = np.eye(3)
    i, j = [(1, 2), (0, 2), (0, 1)][axis]
    m[i, i], m[i, j], m[j, i], m[j, j] = c, -s, s, c
    if axis == 1:  # y-rotation has the +s in the (0,2) slot
        m[0, 2], m[2, 0] = s, -s
    return m


def _trs(t, r, s):
    """T @ Rx @ Ry @ Rz @ S (utilityCore::buildTransformationMatrix,
    /root/reference/src/utilities.cpp:65-72)."""
    rot = _rot(r[0], 0) @ _rot(r[1], 1) @ _rot(r[2], 2)
    m = np.eye(4)
    m[:3, :3] = rot * np.asarray(s, dtype=np.float64)[None, :]
    m[:3, 3] = t
    return m


def _trs_inv(t, r, s):
    rot = _rot(r[0], 0) @ _rot(r[1], 1) @ _rot(r[2], 2)
    lin = rot.T / np.asarray(s, dtype=np.float64)[:, None]
    m = np.eye(4)
    m[:3, :3] = lin
    m[:3, 3] = -lin @ np.asarray(t, dtype=np.float64)
    return m


# ---------------------------------------------------------------------------
# scalar intersections (reference quirks preserved)
# ---------------------------------------------------------------------------

def _isect_box(o, d, fwd, inv):
    ro = inv[:3, :3] @ o + inv[:3, 3]
    rd = _norm(inv[:3, :3] @ d)
    with np.errstate(divide="ignore"):
        t1 = (-0.5 - ro) / rd
        t2 = (0.5 - ro) / rd
    ta, tb = np.minimum(t1, t2), np.maximum(t1, t2)
    sign = np.where(t2 < t1, 1.0, -1.0)
    ta_m = np.where(ta > 0, ta, -1e38)
    tmin, near_ax = ta_m.max(), int(ta_m.argmax())
    tmax, far_ax = tb.min(), int(tb.argmin())
    if not (tmax >= tmin and tmax > 0):
        return None
    inside = tmin <= 0
    t_use, ax = (tmax, far_ax) if inside else (tmin, near_ax)
    n_obj = np.zeros(3)
    n_obj[ax] = sign[ax]
    p_obj = ro + (t_use - RAY_OFFSET) * rd
    point = fwd[:3, :3] @ p_obj + fwd[:3, 3]
    # QUIRK: box normal via the FORWARD transform (intersections.h:85)
    normal = _norm(fwd[:3, :3] @ n_obj)
    dist = float(np.linalg.norm(o - point))
    return dist, point, normal, (not inside)


def _isect_sphere(o, d, fwd, inv, inv_t):
    ro = inv[:3, :3] @ o + inv[:3, 3]
    rd = _norm(inv[:3, :3] @ d)
    vd = float(ro @ rd)
    radicand = vd * vd - (float(ro @ ro) - 0.25)
    if radicand < 0:
        return None
    sq = math.sqrt(radicand)
    t1, t2 = -vd + sq, -vd - sq
    if t1 < 0 and t2 < 0:
        return None
    both_pos = t1 > 0 and t2 > 0
    t_use = min(t1, t2) if both_pos else max(t1, t2)
    p_obj = ro + (t_use - RAY_OFFSET) * rd
    point = fwd[:3, :3] @ p_obj + fwd[:3, 3]
    normal = _norm(inv_t[:3, :3] @ p_obj, eps=1e-20)
    if not both_pos:
        normal = -normal
    dist = float(np.linalg.norm(o - point))
    return dist, point, normal, both_pos


def _isect_scene(o, d, geoms):
    """Nearest hit, strict <, first-geom-wins (the reference's argmin
    tie rule)."""
    best = None
    best_d = NO_HIT
    for g, gm in enumerate(geoms):
        if gm["type"] == "sphere":
            r = _isect_sphere(o, d, gm["fwd"], gm["inv"], gm["inv_t"])
        else:
            r = _isect_box(o, d, gm["fwd"], gm["inv"])
        if r is not None and r[0] < best_d:
            best_d = r[0]
            best = (g,) + r
    return best  # (g, dist, point, normal, outside) or None


# ---------------------------------------------------------------------------
# scalar BSDF (scatterRay lobe policy)
# ---------------------------------------------------------------------------

def _kutz(n):
    if abs(n[0]) < SQ13:
        nn = V(1, 0, 0)
    elif abs(n[1]) < SQ13:
        nn = V(0, 1, 0)
    else:
        nn = V(0, 0, 1)
    p1 = _norm(np.cross(n, nn), eps=1e-20)
    p2 = _norm(np.cross(n, p1), eps=1e-20)
    return p1, p2


def _sample_bsdf(wi, n, outside, m, u):
    """Returns (new_dir, thr_mult(3,), took_diffuse, took_refract)."""
    # diffuse: cosine-weighted hemisphere (interactions.h:11-42)
    up = math.sqrt(u["diff_u1"])
    over = math.sqrt(max(1.0 - up * up, 0.0))
    around = u["diff_u2"] * 2.0 * PI
    p1, p2 = _kutz(n)
    d_diff = up * n + math.cos(around) * over * p1 \
        + math.sin(around) * over * p2

    d_mirror = wi - 2.0 * float(n @ wi) * n
    if m["spec_exponent"] > 0.0:
        n1 = 1.0 / (m["spec_exponent"] + 1.0)
        ct = max(u["spec_u1"], 1e-12) ** n1
        st = math.sqrt(max(1.0 - ct * ct, 0.0))
        phi = u["spec_u2"] * 2.0 * PI
        q1, q2 = _kutz(d_mirror)
        d_spec = ct * d_mirror + math.cos(phi) * st * q1 \
            + math.sin(phi) * st * q2
    else:
        d_spec = d_mirror

    if m["has_refractive"] > 0.0:
        cos_i = min(max(-float(n @ wi), 0.0), 1.0)
        r0 = ((1.0 - m["ior"]) / (1.0 + m["ior"])) ** 2
        refl_prob = r0 + (1.0 - r0) * (1.0 - cos_i) ** 5
        eta = 1.0 / max(m["ior"], 1e-6) if outside else m["ior"]
        cosi = float(n @ wi)
        k = 1.0 - eta * eta * (1.0 - cosi * cosi)
        if k < 0.0:
            d_refr, tir = np.zeros(3), True
        else:
            d_refr = eta * wi - (eta * cosi + math.sqrt(k)) * n
            tir = float(d_refr @ d_refr) < 1e-12
        choose_reflect = (u["fresnel"] < refl_prob) or tir
        if choose_reflect:
            return d_mirror, m["spec_color"], False, False
        return d_refr, m["color"], False, True

    p_spec = min(max(m["has_reflective"], 0.0), 1.0)
    take_spec = u["lobe"] < p_spec
    p_safe = max(p_spec if take_spec else 1.0 - p_spec, 1e-8)
    if take_spec:
        return d_spec, m["spec_color"] / p_safe, False, False
    return d_diff, m["color"] / p_safe, True, False


# ---------------------------------------------------------------------------
# scalar NEE (uniform-by-area cube-light sample + shadow ray)
# ---------------------------------------------------------------------------

def _sample_cube_light(fwd, u_sel, u, v):
    cols = [fwd[:3, j].copy() for j in range(3)]
    trans = fwd[:3, 3]
    faces = []
    for axis in range(3):
        b, c = (axis + 1) % 3, (axis + 2) % 3
        cr = np.cross(cols[b], cols[c])
        area = float(np.linalg.norm(cr))
        orient = float(cr @ cols[axis])
        for sgn in (1.0, -1.0):
            center = trans + cols[axis] * (0.5 * sgn)
            nrm = cr * ((1.0 if orient >= 0 else -1.0) * sgn)
            nrm = nrm / max(float(np.linalg.norm(nrm)), 1e-20)
            faces.append((center, cols[b], cols[c], nrm, area))
    total = sum(f[4] for f in faces)
    cdf, acc = [], 0.0
    for f in faces:
        acc += f[4] / max(total, 1e-20)
        cdf.append(acc)
    pick = 5
    prev = 0.0
    for f in range(6):
        hi = cdf[f]
        if (u_sel >= prev and u_sel < hi) if f < 5 else (u_sel >= prev):
            pick = f
            break
        prev = hi
    center, eb, ec, nrm, _ = faces[pick]
    point = center + (u - 0.5) * eb + (v - 0.5) * ec
    return point, nrm, total


def _nee(scene_s, it, pix, dep, hit, mat, thr, geoms):
    g, dist, point, normal, outside = hit
    total = np.zeros(3)
    for k, li in enumerate(scene_s["lights"]):
        base = NEE_BASE + 3 * k
        u_sel = _uniform(it, pix, dep, base + 0)
        u1 = _uniform(it, pix, dep, base + 1)
        u2 = _uniform(it, pix, dep, base + 2)
        lp, ln, area = _sample_cube_light(geoms[li]["fwd"], u_sel, u1, u2)
        lm = scene_s["materials"][geoms[li]["mid"]]
        emission = lm["color"] * lm["emittance"]
        wl = lp - point
        dist_l = math.sqrt(max(float(wl @ wl), 1e-12))
        sdir = wl / dist_l
        sh = _isect_scene(point, sdir, geoms)
        tol = max(1e-3, 5e-3 * dist_l)
        visible = (sh is not None and sh[0] == li
                   and abs(sh[1] - dist_l) < tol)
        r2 = max(float(wl @ wl), 1e-8)
        wl_n = wl / math.sqrt(r2)
        cos_s = max(float(normal @ wl_n), 0.0)
        cos_l = max(float(ln @ (-wl_n)), 0.0)
        geom_t = cos_s * cos_l / r2
        if visible:
            total = total + thr * (mat["color"] / PI) * emission \
                * (geom_t * area)
    return total


# ---------------------------------------------------------------------------
# scalar path tracer (one iteration, one pixel at a time)
# ---------------------------------------------------------------------------

def render_scalar(scene_s, it, nee):
    w, h = scene_s["res"]
    cam = scene_s["camera"]
    view = _norm(np.asarray(cam["view"], dtype=np.float64))
    right = _norm(np.cross(view, np.asarray(cam["up"], dtype=np.float64)))
    up = _norm(np.cross(right, view))
    tan_y = math.tan(math.radians(cam["fovy"]))
    tan_x = tan_y * (w / h)
    eye = np.asarray(cam["eye"], dtype=np.float64)
    geoms = scene_s["geoms"]
    mats = scene_s["materials"]

    img = np.zeros((w * h, 3))
    for pix in range(w * h):
        x, y = float(pix % w), float(pix // w)
        ju = _uniform(it, pix, 0, AA_X)
        jv = _uniform(it, pix, 0, AA_Y)
        sx = 2.0 * (x + ju) / w - 1.0
        sy = 2.0 * (y + jv) / h - 1.0
        d = _norm(view - right * (tan_x * sx) - up * (tan_y * sy))
        o = eye.copy()
        thr = np.ones(3)
        rad = np.zeros(3)
        emit_ok = True
        for depth in range(scene_s["depth"]):
            hit = _isect_scene(o, d, geoms)
            if hit is None:
                break
            g, dist, point, normal, outside = hit
            m = mats[geoms[g]["mid"]]
            if m["emittance"] > 0.0:
                if (not nee) or emit_ok:
                    rad = rad + thr * m["color"] * m["emittance"]
                break
            dep = depth + 1
            u = {
                "lobe": _uniform(it, pix, dep, LOBE),
                "diff_u1": _uniform(it, pix, dep, DIFF_U1),
                "diff_u2": _uniform(it, pix, dep, DIFF_U2),
                "fresnel": _uniform(it, pix, dep, FRESNEL),
                "spec_u1": _uniform(it, pix, dep, SPEC_U1),
                "spec_u2": _uniform(it, pix, dep, SPEC_U2),
            }
            new_dir, mult, took_diffuse, took_refract = _sample_bsdf(
                d, normal, outside, m, u
            )
            if nee and not (m["has_refractive"] > 0.0):
                rad = rad + _nee(scene_s, it, pix, dep, hit, m, thr,
                                 geoms)
            thr = thr * mult
            if took_refract:
                push = TRANSMISSION_PUSH * max(abs(s) for s in
                                               geoms[g]["scale"])
                o = point + push * new_dir
            else:
                o = point
            d = new_dir
            if nee:
                emit_ok = not took_diffuse
        img[pix] = rad
    return img


# ---------------------------------------------------------------------------
# the shared test scene: literals once, scene text generated from them
# ---------------------------------------------------------------------------

MATERIALS = [
    # color, spec_color, spec_ex, refl, refr, ior, emittance
    dict(color=(1, 1, 1), spec=(0, 0, 0), ex=0, refl=0, refr=0,
         ior=0, emit=5),                                   # light
    dict(color=(.98, .98, .98), spec=(0, 0, 0), ex=0, refl=0, refr=0,
         ior=0, emit=0),                                   # diffuse white
    dict(color=(.85, .35, .35), spec=(0, 0, 0), ex=0, refl=0, refr=0,
         ior=0, emit=0),                                   # diffuse red
    dict(color=(.98, .98, .98), spec=(.98, .98, .98), ex=0, refl=1,
         refr=0, ior=0, emit=0),                           # mirror
    dict(color=(.98, .98, .98), spec=(.98, .98, .98), ex=0, refl=0,
         refr=1, ior=1.5, emit=0),                         # glass
]

GEOMS = [
    # type, material, translate, rotate, scale
    ("cube", 0, (0, 7.45, 0), (0, 0, 0), (3, .3, 3)),      # light
    ("cube", 1, (0, 0, 0), (0, 0, 0), (10, .01, 10)),      # floor
    ("cube", 1, (0, 4, -4), (0, 0, 0), (10, 8, .01)),      # back wall
    ("sphere", 2, (-2, 1.2, -1), (0, 0, 0), (2.4, 2.4, 2.4)),  # red
    ("sphere", 3, (2, 1.2, -1), (0, 0, 0), (2.4, 2.4, 2.4)),   # mirror
    # big central glass sphere: enough fixed-RNG camera rays hit it
    # that both Schlick branches (reflect AND refract) are exercised
    ("sphere", 4, (0, 2.5, 2.0), (0, 0, 0), (3.0, 3.0, 3.0)),  # glass
]

CAMERA = dict(res=(8, 8), fovy=45.0, depth=5, eye=(0.0, 3.0, 9.0),
              view=(0.0, 0.0, -1.0), up=(0.0, 1.0, 0.0))


def _scene_text():
    out = []
    for i, m in enumerate(MATERIALS):
        out += [f"MATERIAL {i}",
                "RGB         %g %g %g" % m["color"],
                f"SPECEX      {m['ex']}",
                "SPECRGB     %g %g %g" % m["spec"],
                f"REFL        {m['refl']}",
                f"REFR        {m['refr']}",
                f"REFRIOR     {m['ior']}",
                f"EMITTANCE   {m['emit']}", ""]
    out += ["CAMERA",
            "RES         %d %d" % CAMERA["res"],
            f"FOVY        {CAMERA['fovy']:g}",
            "ITERATIONS  8",
            f"DEPTH       {CAMERA['depth']}",
            "FILE        oracle",
            "EYE         %g %g %g" % CAMERA["eye"],
            "VIEW        %g %g %g" % CAMERA["view"],
            "UP          %g %g %g" % CAMERA["up"], ""]
    for i, (typ, mid, t, r, s) in enumerate(GEOMS):
        out += [f"OBJECT {i}", typ, f"material {mid}",
                "TRANS       %g %g %g" % t,
                "ROTAT       %g %g %g" % r,
                "SCALE       %g %g %g" % s, ""]
    return "\n".join(out)


def _scene_scalar():
    geoms = []
    for typ, mid, t, r, s in GEOMS:
        geoms.append(dict(
            type=typ, mid=mid, scale=s,
            fwd=_trs(t, r, s), inv=_trs_inv(t, r, s),
            inv_t=_trs_inv(t, r, s).T,
        ))
    mats = [dict(color=np.asarray(m["color"], dtype=np.float64),
                 spec_color=np.asarray(m["spec"], dtype=np.float64),
                 spec_exponent=float(m["ex"]),
                 has_reflective=float(m["refl"]),
                 has_refractive=float(m["refr"]),
                 ior=float(m["ior"]), emittance=float(m["emit"]))
            for m in MATERIALS]
    lights = [g for g, (_, mid, *_r) in enumerate(GEOMS)
              if MATERIALS[mid]["emit"] > 0]
    return dict(res=CAMERA["res"], depth=CAMERA["depth"],
                camera=CAMERA, geoms=geoms, materials=mats,
                lights=lights)


@pytest.fixture(scope="module")
def scene_pair():
    scene = pt.parse_scene(_scene_text())
    return scene, _scene_scalar()


@pytest.mark.parametrize("nee", [False, True],
                         ids=["bsdf-only", "nee"])
@pytest.mark.parametrize("it", [1, 2])
def test_integrator_matches_independent_scalar_oracle(scene_pair, it,
                                                      nee):
    """A shared-code bug anywhere in ops/ or render/ now fails against
    a renderer that imports none of it."""
    import numpy as _np

    from pathtrace_tpu.render.integrator import pathtrace_iteration

    scene, scene_s = scene_pair
    got, _ = pathtrace_iteration(scene, it, nee=nee)
    want = render_scalar(scene_s, it, nee=nee)
    got = _np.asarray(got, dtype=_np.float64)
    # f32 engine vs f64 scalar spec: agreement well past any
    # plausible semantic bug (branch flips would diverge by O(1))
    _np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_oracle_scene_exercises_all_lobes(scene_pair):
    """The pin is only as strong as its coverage: assert the fixed-RNG
    frame actually takes diffuse, mirror, refract AND reflect-at-glass
    branches, and that NEE finds visible light samples."""
    _, scene_s = scene_pair
    counts = dict(diffuse=0, mirror=0, refract=0, glass_reflect=0)
    w, h = scene_s["res"]
    for it in (1, 2):
        for pix in range(w * h):
            # re-trace with instrumentation (cheap at 8x8)
            taken = _trace_lobes(scene_s, it, pix)
            for k in taken:
                counts[k] += 1
    assert all(v > 0 for v in counts.values()), counts


def _trace_lobes(scene_s, it, pix):
    w, h = scene_s["res"]
    cam = scene_s["camera"]
    view = _norm(np.asarray(cam["view"], dtype=np.float64))
    right = _norm(np.cross(view, np.asarray(cam["up"], dtype=np.float64)))
    up = _norm(np.cross(right, view))
    tan_y = math.tan(math.radians(cam["fovy"]))
    tan_x = tan_y * (w / h)
    x, y = float(pix % w), float(pix // w)
    sx = 2.0 * (x + _uniform(it, pix, 0, AA_X)) / w - 1.0
    sy = 2.0 * (y + _uniform(it, pix, 0, AA_Y)) / h - 1.0
    d = _norm(view - right * (tan_x * sx) - up * (tan_y * sy))
    o = np.asarray(cam["eye"], dtype=np.float64).copy()
    taken = set()
    for depth in range(scene_s["depth"]):
        hit = _isect_scene(o, d, scene_s["geoms"])
        if hit is None:
            break
        g, dist, point, normal, outside = hit
        m = scene_s["materials"][scene_s["geoms"][g]["mid"]]
        if m["emittance"] > 0:
            break
        dep = depth + 1
        u = {k: _uniform(it, pix, dep, s) for k, s in
             [("lobe", LOBE), ("diff_u1", DIFF_U1),
              ("diff_u2", DIFF_U2), ("fresnel", FRESNEL),
              ("spec_u1", SPEC_U1), ("spec_u2", SPEC_U2)]}
        new_dir, mult, took_diffuse, took_refract = _sample_bsdf(
            d, normal, outside, m, u
        )
        if m["has_refractive"] > 0:
            taken.add("refract" if took_refract else "glass_reflect")
        elif took_diffuse:
            taken.add("diffuse")
        else:
            taken.add("mirror")
        if took_refract:
            push = TRANSMISSION_PUSH * max(
                abs(s) for s in scene_s["geoms"][g]["scale"])
            o = point + push * new_dir
        else:
            o = point
        d = new_dir
    return taken
