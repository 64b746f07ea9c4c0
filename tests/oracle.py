"""Scalar reference oracle: a per-pixel transliteration of the GLSL shaders.

The reference renderer is WebGL2; there is no browser/GPU in this
environment, so image parity is proven against an INDEPENDENT scalar
re-implementation of the reference's shader stack, written directly from
the GLSL sources (cited per function) with per-pixel divergent control
flow — the exact control structure the GPU executes, with none of the
wavefront machinery under test. The production renderer and this oracle
share only (a) input data (brick grid / LUT / env textures — the data
pipeline is validated separately) and (b) the RNG bit-stream, which is
itself pinned against random.glsl by tests/test_rng.py. If the wavefront
renderer diverges from the reference's math, it diverges from this oracle.

Everything is computed in float32 (numpy scalars), matching GLSL highp
float semantics; residual differences vs the XLA renderer are op-ordering
ulps (XLA fuses FMAs), not semantic drift.
"""

from __future__ import annotations

import numpy as np

F = np.float32
M_PI = F(np.pi)
INV_4PI = F(1.0 / (4.0 * np.pi))

# ---------------------------------------------------------------------------
# RNG — random.glsl:41-118 (bit-exact integer pipeline, python ints)
# ---------------------------------------------------------------------------

_M = 0xFFFFFFFF


def tea(val0: int, val1: int, rounds: int = 32) -> int:
    """random.glsl:41-51"""
    v0, v1, s0 = val0 & _M, val1 & _M, 0
    for _ in range(rounds):
        s0 = (s0 + 0x9E3779B9) & _M
        v0 = (
            v0
            + ((((v1 << 4) & _M) + 0xA341316C) ^ ((v1 + s0) & _M) ^ ((v1 >> 5) + 0xC8013EA4))
        ) & _M
        v1 = (
            v1
            + ((((v0 << 4) & _M) + 0xAD90777D) ^ ((v0 + s0) & _M) ^ ((v0 >> 5) + 0x7E95761E))
        ) & _M
    return v0


def _wang(x: int) -> int:
    x = ((x ^ 61) ^ (x >> 16)) & _M
    x = (x * 9) & _M
    x = (x ^ (x >> 4)) & _M
    x = (x * 0x27D4EB2D) & _M
    x = (x ^ (x >> 15)) & _M
    return x


class Rand:
    """xoshiro128++ stream (random.glsl:69-94)."""

    def __init__(self, seed: int):
        self.s = [_wang((seed + i) & _M) for i in range(4)]

    def _next_u32(self) -> int:
        s0, s1, s2, s3 = self.s
        result = ((((s0 + s2) & _M) << 7 | ((s0 + s2) & _M) >> 25) + s0) & _M
        t = (s1 << 9) & _M
        s2 ^= s0
        s3 ^= s1
        s1 ^= s2
        s0 ^= s3
        s2 ^= t
        s3 = ((s3 << 11) | (s3 >> 21)) & _M
        self.s = [s0, s1, s2, s3]
        return result

    def rng(self) -> np.float32:
        """float in [0,1) from the top 24 bits (random.glsl:103-106)."""
        return F(self._next_u32() >> 8) * F(1.0 / 16777216.0)

    def rng2(self):
        return self.rng(), self.rng()

    def rng3(self):
        return self.rng(), self.rng(), self.rng()


# ---------------------------------------------------------------------------
# math / ray utils — utils.glsl
# ---------------------------------------------------------------------------


def ray_box_intersection(origin, direction, lo, hi):
    """utils.glsl:61-69 -> (hit, near, far)"""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = F(1.0) / direction
        t_lo = (lo - origin) * inv
        t_hi = (hi - origin) * inv
    tmin = np.minimum(t_lo, t_hi)
    tmax = np.maximum(t_lo, t_hi)
    near = max(F(0.0), tmin.max())
    far = tmax.min()
    return near <= far, F(near), F(far)


def luma(col) -> np.float32:
    return F(col[0] * F(0.212671) + col[1] * F(0.715160) + col[2] * F(0.072169))


def power_heuristic(a, b) -> np.float32:
    return F(a * a) / F(a * a + b * b)


def sanitize3(v):
    return np.where(np.isfinite(v), v, F(0.0)).astype(F)


def phase_hg(cos_t, g) -> np.float32:
    """utils.glsl:121-125"""
    denom = F(1.0) + g * g + F(2.0) * g * cos_t
    return INV_4PI * (F(1.0) - g * g) / F(denom * np.sqrt(denom))


def _align(n, v):
    """utils.glsl:106-113"""
    if abs(n[0]) > abs(n[1]):
        t = np.array([-n[2], 0.0, n[0]], F) / F(np.sqrt(n[0] * n[0] + n[2] * n[2]))
    else:
        t = np.array([0.0, n[2], -n[1]], F) / F(np.sqrt(n[1] * n[1] + n[2] * n[2]))
    b = np.cross(n, t).astype(F)
    out = v[0] * t + v[1] * b + v[2] * n
    return out / F(np.linalg.norm(out))


def sample_phase_hg(direction, g, u1, u2):
    """utils.glsl:131-138"""
    if abs(g) < 1e-4:
        cos_t = F(1.0) - F(2.0) * u1
    else:
        sq = (F(1.0) - g * g) / (F(1.0) - g + F(2.0) * g * u1)
        cos_t = (F(1.0) + g * g - sq * sq) / (F(2.0) * g)
    sin_t = F(np.sqrt(max(0.0, 1.0 - cos_t * cos_t)))
    phi = F(2.0) * M_PI * u2
    local = np.array([sin_t * np.cos(phi), sin_t * np.sin(phi), cos_t], F)
    return _align(direction, local)


# ---------------------------------------------------------------------------
# the oracle renderer
# ---------------------------------------------------------------------------


class Oracle:
    """Scalar renderer over a framework Renderer's scene state."""

    def __init__(self, renderer):
        self.r = renderer
        g = renderer.grid
        p = renderer.volume_params()
        self.aabb_lo = np.asarray(p.aabb_lo, F)
        self.aabb_hi = np.asarray(p.aabb_hi, F)
        self.tinv = np.asarray(p.transform_inv, F)
        self.vol_maj = F(p.vol_maj)
        self.inv_maj = F(p.inv_maj)
        self.density_scale = F(p.density_scale)
        self.albedo = np.asarray(p.albedo, F)
        self.phase_g = F(p.phase_g)
        self.sample_range = np.asarray(p.sample_range, F)
        self.lut = np.asarray(renderer._lut, F)
        # brick-grid textures in the reference layout (texelFetch targets)
        self.range_lo = np.asarray(g.range_lo, F)
        self.range_hi = np.asarray(g.range_hi, F)
        self.ptr = np.asarray(g.indirection, np.int64)  # (bz,by,bx,3) xyz
        self.atlas = np.asarray(g.atlas, np.uint8)
        # range mips: level 0 = range_hi, 1..3 pooled (brick.rs:154-190)
        self.mips_hi = [self.range_hi] + [hi.astype(F) for _, hi in g.range_mips]
        self.extent = np.array(g.index_extent, np.int64)  # (x, y, z)
        # environment (texture space, v = row direction)
        env = renderer.environment.state
        self.envmap = np.asarray(env.envmap, F)
        self.imp_mips = [np.asarray(m, F) for m in env.imp_mips]
        self.env_strength = F(env.strength)
        self.use_env = bool(renderer.settings.use_env)
        self.show_environment = bool(renderer.settings.show_environment)
        self.bounces = int(renderer.settings.bounces)
        self.mode = renderer.settings.render_mode
        ld = np.asarray(renderer.settings.light_dir, np.float64)
        self.light_dir = (ld / np.linalg.norm(ld)).astype(F)
        w, h = renderer.width, renderer.height
        self.res = (w, h)
        self.inv_view = np.linalg.inv(renderer.camera.view_matrix()).astype(F)
        self.inv_proj = np.linalg.inv(
            renderer.camera.proj_matrix(w / h)
        ).astype(F)

    # -- brick decode (sampling/common.glsl) --------------------------------

    def _density_brick(self, iipos) -> np.float32:
        """common.glsl:35-43; OOB texelFetch returns 0 (WebGL2 robustness)."""
        ix, iy, iz = iipos
        if ix < 0 or iy < 0 or iz < 0 or ix >= self.extent[0] or iy >= self.extent[1] or iz >= self.extent[2]:
            return F(0.0)
        bx, by, bz = ix >> 3, iy >> 3, iz >> 3
        lo = self.range_lo[bz, by, bx]
        hi = self.range_hi[bz, by, bx]
        px, py, pz = self.ptr[bz, by, bx]
        v = self.atlas[
            (pz << 3) + (iz & 7), (py << 3) + (iy & 7), (px << 3) + (ix & 7)
        ]
        value_unorm = F(v) / F(255.0)
        return F(lo + value_unorm * (hi - lo))

    def _majorant(self, ipos, mip: int) -> np.float32:
        """common.glsl:50-53 (range texel .x at mip = brick max)."""
        m = self.mips_hi[mip]
        b = np.floor(ipos).astype(np.int64) >> (3 + mip)
        bx, by, bz = b
        if (
            bx < 0 or by < 0 or bz < 0
            or bz >= m.shape[0] or by >= m.shape[1] or bx >= m.shape[2]
        ):
            return F(0.0)
        return F(self.density_scale * m[bz, by, bx])

    def _density_trilinear(self, ipos) -> np.float32:
        """common.glsl:61-69 (exact mix order)."""
        p = ipos - F(0.5)
        iipos = np.floor(p).astype(np.int64)
        f = (p - iipos).astype(F)
        d = self._density_brick

        def mix(a, b, t):
            return F(a + (b - a) * t)

        lx0 = mix(d(iipos + (0, 0, 0)), d(iipos + (1, 0, 0)), f[0])
        lx1 = mix(d(iipos + (0, 1, 0)), d(iipos + (1, 1, 0)), f[0])
        hx0 = mix(d(iipos + (0, 0, 1)), d(iipos + (1, 0, 1)), f[0])
        hx1 = mix(d(iipos + (0, 1, 1)), d(iipos + (1, 1, 1)), f[0])
        return F(self.density_scale * mix(mix(lx0, lx1, f[1]), mix(hx0, hx1, f[1]), f[2]))

    def _density_stochastic(self, ipos, rand: Rand) -> np.float32:
        """common.glsl:72-76 via stochastic_tricubic_filter (common.glsl:12-32)."""
        iipos = np.floor(ipos - F(0.5)).astype(np.int64)
        t = (ipos - F(0.5) - iipos).astype(F)
        t2 = t * t
        sixth = F(1.0 / 6.0)
        w = sixth * (-t * t2 + F(3.0) * t2 - F(3.0) * t + F(1.0))
        sum_wt = w.copy()
        idx = np.zeros(3, np.int64)
        for tap, w in (
            (1, sixth * (F(3.0) * t * t2 - F(6.0) * t2 + F(4.0))),
            (2, sixth * (F(-3.0) * t * t2 + F(3.0) * t2 + F(3.0) * t + F(1.0))),
            (3, sixth * t * t2),
        ):
            sum_wt = (w + sum_wt).astype(F)
            r3 = np.array(rand.rng3(), F)
            accept = r3 < w / np.maximum(F(1e-3), sum_wt)
            idx = np.where(accept, tap, idx)
        pos = iipos + idx - 1
        return F(self.density_scale * self._density_brick(pos))

    def _transfer(self, density) -> np.ndarray:
        """common.glsl:78-83 (NEAREST + CLAMP_TO_EDGE, viewer.ts:386-389)."""
        if density < self.sample_range[0] or density > self.sample_range[1]:
            return np.zeros(4, F)
        k = self.lut.shape[0]
        i = min(max(int(np.floor(density * k)), 0), k - 1)
        return self.lut[i]

    # -- environment (environment.glsl) -------------------------------------

    def _env_bilinear(self, tex, u, v):
        """GL LINEAR, REPEAT in u / CLAMP in v (environment.ts:23-26)."""
        h, w = tex.shape[0], tex.shape[1]
        x = u * w - 0.5
        y = v * h - 0.5
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = F(x - x0), F(y - y0)
        x0i, x1i = x0 % w, (x0 + 1) % w
        y0i = min(max(y0, 0), h - 1)
        y1i = min(max(y0 + 1, 0), h - 1)
        t00, t01 = tex[y0i, x0i], tex[y0i, x1i]
        t10, t11 = tex[y1i, x0i], tex[y1i, x1i]
        top = t00 * (1 - fx) + t01 * fx
        bot = t10 * (1 - fx) + t11 * fx
        return (top * (1 - fy) + bot * fy).astype(F)

    def lookup_environment(self, direction):
        """environment.glsl:19-27"""
        if not self.use_env:
            d = F(np.dot(direction, -self.light_dir))
            val = F(min(max(d, 0.0) ** 300.0, 1.0) * 4.0 + 0.01)
            return self.env_strength * np.array([val, val, val], F)
        u = F(np.arctan2(direction[2], direction[0]) / (2.0 * np.pi) + 0.5)
        v = F(1.0 - np.arccos(np.clip(direction[1], -1, 1)) / np.pi)
        return self.env_strength * self._env_bilinear(self.envmap, u, v)

    def sample_environment(self, u1, u2):
        """environment.glsl:29-80 -> (Le, pdf, w_i)"""
        if not self.use_env:
            le = F(self.env_strength * F(4.01))
            return np.array([le, le, le], F), F(1.0), -self.light_dir
        pos = np.zeros(2, np.int64)  # (x, y)
        px, py = F(u1), F(u2)
        base = len(self.imp_mips) - 1
        for mip in range(base - 1, -1, -1):
            m = self.imp_mips[mip]
            pos *= 2
            w00 = m[pos[1], pos[0]]
            w10 = m[pos[1], pos[0] + 1]
            w01 = m[pos[1] + 1, pos[0]]
            w11 = m[pos[1] + 1, pos[0] + 1]
            q0 = F(w00 + w01)
            q1 = F(w10 + w11)
            d = q0 / max(F(1e-8), F(q0 + q1))
            if px < d:
                off_x = 0
                px = px / d
            else:
                off_x = 1
                px = (px - d) / (F(1.0) - d)
            pos[0] += off_x
            e = F([w00, w10][off_x]) / F([q0, q1][off_x])
            if py < e:
                py = py / e
            else:
                pos[1] += 1
                py = (py - e) / (F(1.0) - e)
        dim = self.imp_mips[0].shape[0]
        uv_x = F((pos[0] + px) / dim)
        uv_y = F((pos[1] + py) / dim)
        theta = F(min(max(1.0 - uv_y, 0.0), 1.0) * np.pi)
        phi = F((min(max(uv_x, 0.0), 1.0) * 2.0 - 1.0) * np.pi)
        sin_t = F(np.sin(theta))
        w_i = np.array(
            [sin_t * np.cos(phi), np.cos(theta), sin_t * np.sin(phi)], F
        )
        le = self.env_strength * self._env_bilinear(self.envmap, uv_x, uv_y)
        avg_w = self.imp_mips[-1][0, 0]
        pdf = F(self.imp_mips[0][pos[1], pos[0]] / avg_w) * INV_4PI
        return le, pdf, w_i

    def pdf_environment(self, direction) -> np.float32:
        """environment.glsl:82-86 (incl. the strength-scaling quirk)."""
        avg_w = self.imp_mips[-1][0, 0] if self.use_env else F(1.0)
        if not self.use_env:
            return F(luma(self.lookup_environment(direction)) * INV_4PI)
        return F(luma(self.lookup_environment(direction)) / avg_w) * INV_4PI

    # -- traversal modes -----------------------------------------------------

    def _to_index(self, origin, direction):
        o = self.tinv @ np.append(origin, F(1.0))
        d = self.tinv @ np.append(direction, F(0.0))
        return o[:3].astype(F), d[:3].astype(F)

    @staticmethod
    def _step_dda(pos, inv_dir, mip: int) -> np.float32:
        """dda.glsl:10-16"""
        dim = F(8 << mip)
        offs = np.where(inv_dir >= 0.0, dim + F(0.5), F(-0.5)).astype(F)
        tmax = (np.floor(pos * (F(1.0) / dim)) * dim + offs - pos) * inv_dir
        return F(tmax.min())

    def sample_volume_dda(self, origin, direction, rand: Rand):
        """dda.glsl:65-98 -> (hit, t, rgb)"""
        hit_box, near, far = ray_box_intersection(
            origin, direction, self.aabb_lo, self.aabb_hi
        )
        if not hit_box:
            return False, F(0.0), None
        ipos, idir = self._to_index(origin, direction)
        with np.errstate(divide="ignore"):
            ri = (F(1.0) / idir).astype(F)
        t = F(near + F(1e-6))
        tau = F(-np.log(F(1.0) - rand.rng()))
        mip = F(3.0)
        while t < far:
            mip_i = int(np.clip(np.floor(mip + 0.5), 0, 3))
            curr = ipos + t * idir
            majorant = F(
                self.vol_maj
                * self._transfer(self._majorant(curr, mip_i) * self.inv_maj)[3]
            )
            dt = self._step_dda(curr, ri, mip_i)
            t = F(t + dt)
            tau = F(tau - majorant * dt)
            mip = F(min(mip + F(0.25), 3.0))
            if tau > 0.0:
                continue
            t = F(t + tau / majorant)
            if t >= far:
                break
            rgba = self._transfer(
                self._density_trilinear(ipos + t * idir) * self.inv_maj
            )
            d = F(self.vol_maj * rgba[3])
            if rand.rng() * majorant < d:
                return True, t, rgba[:3].copy()
            tau = F(-np.log(F(1.0) - rand.rng()))
            mip = F(max(0.0, mip - F(2.0)))
        return False, t, None

    def transmittance_dda(self, origin, direction, rand: Rand) -> np.float32:
        """dda.glsl:21-62 (incl. the binary-shadow quirk at :48)."""
        hit_box, near, far = ray_box_intersection(
            origin, direction, self.aabb_lo, self.aabb_hi
        )
        if not hit_box:
            return F(1.0)
        ipos, idir = self._to_index(origin, direction)
        with np.errstate(divide="ignore"):
            ri = (F(1.0) / idir).astype(F)
        t = F(near + F(1e-6))
        tr = F(1.0)
        tau = F(-np.log(F(1.0) - rand.rng()))
        mip = F(3.0)
        step = 0
        while t < far and step < 100:
            step += 1
            mip_i = int(np.clip(np.floor(mip + 0.5), 0, 3))
            curr = ipos + t * idir
            majorant = F(
                self.vol_maj
                * self._transfer(self._majorant(curr, mip_i) * self.inv_maj)[3]
            )
            dt = self._step_dda(curr, ri, mip_i)
            t = F(t + dt)
            tau = F(tau - majorant * dt)
            mip = F(min(mip + F(0.25), 3.0))
            if tau > 0.0:
                continue
            t = F(t + tau / majorant)
            if t >= far:
                break
            rgba = self._transfer(
                self._density_trilinear(ipos + t * idir) * self.inv_maj
            )
            d = F(self.vol_maj * rgba[3])
            if rand.rng() * majorant < d:
                tr = F(tr * max(F(0.0), F(1.0) - self.vol_maj / majorant))
                if tr < 0.1:
                    prob = F(1.0) - tr
                    if rand.rng() < prob:
                        return F(0.0)
                    tr = F(tr / (F(1.0) - prob))
            tau = F(-np.log(F(1.0) - rand.rng()))
            mip = F(max(0.0, mip - F(2.0)))
        return tr

    def sample_volume_simple(self, origin, direction, rand: Rand):
        """normal.glsl:33-57 (delta tracking)."""
        hit_box, near, far = ray_box_intersection(
            origin, direction, self.aabb_lo, self.aabb_hi
        )
        if not hit_box:
            return False, F(0.0), None
        ipos, idir = self._to_index(origin, direction)
        t = F(near - np.log(F(1.0) - rand.rng()) * self.inv_maj)
        while t < far:
            rgba = self._transfer(
                self._density_trilinear(ipos + t * idir) * self.inv_maj
            )
            d = F(self.vol_maj * rgba[3])
            p_real = F(d * self.inv_maj)
            if rand.rng() < p_real:
                return True, t, rgba[:3].copy()
            t = F(t - np.log(F(1.0) - rand.rng()) * self.inv_maj)
        return False, t, None

    def transmittance_simple(self, origin, direction, rand: Rand) -> np.float32:
        """normal.glsl:6-31 (ratio tracking)."""
        hit_box, near, far = ray_box_intersection(
            origin, direction, self.aabb_lo, self.aabb_hi
        )
        if not hit_box:
            return F(1.0)
        ipos, idir = self._to_index(origin, direction)
        t = F(near - np.log(F(1.0) - rand.rng()) * self.inv_maj)
        tr = F(1.0)
        while t < far:
            rgba = self._transfer(
                self._density_trilinear(ipos + t * idir) * self.inv_maj
            )
            d = F(self.vol_maj * rgba[3])
            tr = F(tr * (F(1.0) - d * self.inv_maj))
            if tr < 0.1:
                prob = F(1.0) - tr
                if rand.rng() < prob:
                    return F(0.0)
                tr = F(tr / (F(1.0) - prob))
            t = F(t - np.log(F(1.0) - rand.rng()) * self.inv_maj)
        return tr

    def sample_volume_raymarch(self, origin, direction, rand: Rand):
        """raymarch.glsl:28-55"""
        hit_box, near, far = ray_box_intersection(
            origin, direction, self.aabb_lo, self.aabb_hi
        )
        if not hit_box:
            return False, F(0.0), None
        ipos, idir = self._to_index(origin, direction)
        tau_target = F(-np.log(F(1.0) - rand.rng()))
        dt = F((far - near) / F(64.0))
        near = F(near + rand.rng() * dt)
        tau = F(0.0)
        t = F(0.0)
        for i in range(64):
            t = F(min(near + F(i) * dt, far))
            d = self._density_stochastic(ipos + t * idir, rand)
            rgba = self._transfer(d * self.inv_maj)
            tau = F(tau + rgba[3] * self.vol_maj * dt)
            if tau >= tau_target:
                return True, t, rgba[:3].copy()
        return False, t, None

    def transmittance_raymarch(self, origin, direction, rand: Rand) -> np.float32:
        """raymarch.glsl:8-23"""
        hit_box, near, far = ray_box_intersection(
            origin, direction, self.aabb_lo, self.aabb_hi
        )
        if not hit_box:
            return F(1.0)
        ipos, idir = self._to_index(origin, direction)
        dt = F((far - near) / F(64.0))
        near = F(near + rand.rng() * dt)
        tau = F(0.0)
        for i in range(64):
            t = F(min(near + F(i) * dt, far))
            d = self._density_stochastic(ipos + t * idir, rand)
            tau = F(tau + self._transfer(d * self.inv_maj)[3] * self.vol_maj * dt)
        return F(np.exp(-tau))

    def _mode_fns(self):
        return {
            "default": (self.sample_volume_dda, self.transmittance_dda),
            "no_dda": (self.sample_volume_simple, self.transmittance_simple),
            "raymarch": (self.sample_volume_raymarch, self.transmittance_raymarch),
        }[self.mode]

    # -- path tracing (fragment.frag:79-124) ---------------------------------

    def trace_path(self, origin, direction, rand: Rand):
        sample_volume, transmittance = self._mode_fns()
        L = np.zeros(3, F)
        throughput = np.ones(3, F)
        free_path = True
        n_paths = 0
        f_p = F(0.0)
        origin = origin.copy()
        direction = direction.copy()
        while True:
            hit, t, rgb = sample_volume(origin, direction, rand)
            if hit:
                throughput = (throughput * self.albedo * rgb).astype(F)
            if not hit:
                break
            origin = (origin + t * direction).astype(F)

            # NEE (fragment.frag:88-98)
            u1, u2 = rand.rng2()
            le, pdf, w_i = self.sample_environment(u1, u2)
            if pdf > 0.0:
                f_p = phase_hg(F(np.dot(-direction, w_i)), self.phase_g)
                mis = (
                    power_heuristic(pdf, f_p)
                    if self.show_environment
                    else F(1.0)
                )
                tr = transmittance(origin, w_i, rand)
                L = (L + throughput * mis * f_p * tr * le / pdf).astype(F)

            n_paths += 1
            if n_paths >= self.bounces:
                free_path = False
                break
            rr_val = luma(throughput)
            if rr_val < 0.1:
                prob = F(1.0) - rr_val
                if rand.rng() < prob:
                    free_path = False
                    break
                throughput = (throughput / (F(1.0) - prob)).astype(F)

            u1, u2 = rand.rng2()
            scatter = sample_phase_hg(direction, self.phase_g, u1, u2)
            f_p = phase_hg(F(np.dot(-direction, scatter)), self.phase_g)
            direction = scatter

        if free_path and self.show_environment:
            le = self.lookup_environment(direction)
            mis = (
                power_heuristic(f_p, self.pdf_environment(direction))
                if n_paths > 0
                else F(1.0)
            )
            L = (L + throughput * mis * le).astype(F)
        return sanitize3(L)

    # -- per-pixel main (fragment.frag:128-164) -------------------------------

    def render_sample(self, px: int, py: int, frame: int) -> np.ndarray:
        """One progressive sample for pixel (px, py); py=0 = image bottom
        (GL fragment convention, same as the framework's framebuffer)."""
        w, h = self.res
        pixel_index = py * w + px
        rand = Rand(tea((42 * pixel_index) & _M, frame))
        j1 = rand.rng2()
        j2 = rand.rng2()
        tex = np.array([(px + 0.5) / w, (py + 0.5) / h], F)
        jitter = np.array(
            [(j1[0] + j2[0]) / F(2.0), (j1[1] + j2[1]) / F(2.0)], F
        )
        ndc = tex + (jitter * F(2.0) - F(1.0)) / np.array([w, h], F)

        # cameraWorldPos / cameraWorldDir (utils.glsl:23-40)
        cam = self.inv_view @ np.array([0, 0, 0, 1], F)
        cam = (cam[:3] / cam[3]).astype(F)
        clip = np.array([ndc[0] * 2 - 1, ndc[1] * 2 - 1, 0.0, 1.0], F)
        vp = self.inv_proj @ clip
        vp = vp[:3] / vp[3]
        wp = self.inv_view @ np.append(vp, F(1.0))
        wp = wp[:3] / wp[3]
        direction = (wp - cam).astype(F)
        direction = (direction / F(np.linalg.norm(direction))).astype(F)
        return self.trace_path(cam, direction, rand)

    def render(self, n_samples: int, skip_warmup: int = 5) -> np.ndarray:
        """Mean of samples [skip_warmup, n_samples) -> (h*w, 3), matching
        the framework's accumulate_progressive telescoped average."""
        w, h = self.res
        acc = np.zeros((h * w, 3), np.float64)
        count = 0
        for frame in range(skip_warmup, n_samples):
            for py in range(h):
                for px in range(w):
                    acc[py * w + px] += self.render_sample(px, py, frame)
            count += 1
        return (acc / max(count, 1)).astype(np.float32)
