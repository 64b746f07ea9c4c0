"""Renderer facade: the TPU-native counterpart of Volxel3DDicomRenderer.

Owns the scene (volume, camera, environment, transfer LUT), the viewer
settings, and the progressive accumulation loop. Public API mirrors the
reference web component (viewer.ts:111+):

  restart_from_files / restart_from_zip / restart_from_grid   (viewer.ts:963-1017)
  load_env / load_env_default                                 (viewer.ts:1019-1040)
  restore_settings / export_settings                          (viewer.ts:626-762)
  render_frame / image / restart_rendering                    (viewer.ts:1183-1293)
  render_mode property                                        (viewer.ts:1442-1452)

Progressive semantics preserved: sample 0..4 are warm-up (sample_weight=0,
each overwrites the buffer — viewer.ts:132,1356), accumulation starts at
sample 5 as a running average. The reference's warm-up also drops to 0.33
resolution for responsiveness; on TPU a resolution change would trigger a
re-jit, so warm-up keeps full resolution (the converged image is identical
because warm-up samples have zero weight).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from volxel_tpu.api.settings import ViewerSettings, make_settings_export
from volxel_tpu.grid.brick import BrickGrid
from volxel_tpu.ingest.hdr import decode_env_bytes
from volxel_tpu.ingest.series import read_dicoms_to_grid
from volxel_tpu.ingest.ziploader import read_zip_to_grid
from volxel_tpu.render.pathtrace import (
    RenderConfig,
    accumulate_progressive,
    render_sample,
    tonemap,
)
from volxel_tpu.render.sampling import VolumeParams, device_grid_from_brick
from volxel_tpu.scene.camera import Camera
from volxel_tpu.scene.environment import Environment, default_environment
from volxel_tpu.scene.volume import Volume
from volxel_tpu.transfer.function import (
    DEFAULT_COLOR_STOPS,
    generate_transfer_function,
)

LOW_RESOLUTION_DURATION = 5  # warm-up samples (viewer.ts:132)


def _fetch_url(url: str) -> bytes:
    """GET a resource — the fetch() behind restartFromZipUrl /
    loadEnvFromUrl (viewer.ts:991-1003,1035-1040). Raises on non-2xx
    like the reference's response.ok check."""
    from urllib.request import urlopen

    with urlopen(url) as resp:  # noqa: S310 — caller-provided URL by design
        return resp.read()


class Renderer:
    def __init__(
        self,
        width: int = 1920,
        height: int = 1080,
        maj_dtype: str = "float32",
        premul_majorant: bool = True,
        compact_decode: bool | str = "loop",
        march_ladder: bool = True,
        mxu_gather: bool | str = "auto",
        pair_decode: bool = True,
        quad_decode: bool = False,
        octo_decode: bool | str = "auto",
        tile_march: bool | str = "auto",
        compact_secondary: bool | str = "auto",
        settings: ViewerSettings | None = None,
    ):
        self.width = int(width)
        self.height = int(height)
        # "bfloat16": store the majorant pyramid in bf16 (rounded up —
        # still a valid bound); halves the hot per-DDA-step gather
        # traffic. Statistically identical, not bit-identical (see
        # device_grid_from_brick), so opt-in.
        self.maj_dtype = maj_dtype
        # fold transfer alpha into the majorant pyramid in-graph so the
        # DDA march gathers once per step instead of twice
        # (RenderConfig.premul_majorant). Bit-identical renders; the
        # honest sync-mode A/B measured -9.6% real frame time
        # (examples/profile_real3.py, NOTES.md r5), so default ON.
        self.premul_majorant = bool(premul_majorant)
        # single-loop DDA with the collision decode compacted to the
        # collided lanes (RenderConfig.compact_decode). Same estimator;
        # bit-identical below modes.COMPACT_DECODE_MIN_LANES lanes, ulp
        # realization contract above. Default "loop": -67.6% real frame
        # time in the honest sync-mode A/B (examples/ab_compact.py).
        self.compact_decode = compact_decode
        # in-loop shrink ladder for the single-loop marches
        # (RenderConfig.march_ladder): narrow the whole march as lanes
        # terminate. Same ulp realization contract as compact_decode.
        self.march_ladder = bool(march_ladder)
        # one-hot MXU matmul for the march's majorant fetch
        # (RenderConfig.mxu_gather). Bit-identical values — but a
        # MEASURED LOSS on the chip (+5.3% vs the warp-table baseline,
        # examples/ab_mxu.py r9: the pallas_call + N*T MAC cost inside
        # the while_loop body exceeds the serialized gather at shipped
        # table sizes), so "auto" resolves to OFF; True forces it on.
        self.mxu_gather = mxu_gather
        # x-pair packed dense field: the trilinear decode fetches its 8
        # taps with 4 serialized gathers (sampling.pack_dense_pairs).
        # Bit-identical; costs a second dense-sized operand in HBM.
        # Honest sync-mode A/B: -15.8% frame time (examples/ab_mxu.py
        # r9, 960x540/256^3), so default ON.
        self.pair_decode = bool(pair_decode)
        # xy-quad packed dense field: the trilinear decode fetches its 8
        # taps with TWO complex64 gathers (sampling.pack_dense_quads) —
        # the next rung of pair_decode's per-access pricing. Bit-identical;
        # costs 4x the bf16 field in HBM (1 GiB at 512^3). Takes
        # precedence over pair_decode. Opt-in pending the chip A/B.
        self.quad_decode = bool(quad_decode)
        # full-stencil packed dense field: ONE (Z, Y, X, 4)-uint32 row
        # gather fetches all 8 trilinear taps (sampling.pack_dense_octo —
        # probe_wide_gather.py measured a trailing size-4 gather window
        # priced like a single element access). Bit-identical; honest
        # sync-mode A/B: -20.9% frame time vs the pair baseline
        # (examples/ab_packdec.py, 960x540/256^3), so default ON via
        # "auto" — which engages only while the packed field fits
        # OCTO_BUDGET_BYTES (16 B/voxel: 2 GiB at 512^3, but 16 GiB at
        # 1024^3 — beyond-budget volumes fall back to pair_decode).
        # Takes precedence over quad/pair.
        self.octo_decode = octo_decode
        # raymarch mode: camera-wavefront taps via the pipelined
        # tile-march Pallas kernel (RenderConfig.tile_march) — the
        # bandwidth-bound window-select path. BIT-identical renders
        # (in-window lanes replicate the exact op/draw chain; misses
        # re-trace through the XLA loop, tests/test_tilemarch.py).
        # "auto" engages on the TPU backend (the kernel exists to beat
        # the serialized-gather latency wall; CPU interprets it many
        # times slower); True forces it for tests.
        self.tile_march = tile_march
        # sort + width-compact the NEE/extension wavefronts
        # (RenderConfig.compact_secondary). "auto" = ON for raymarch
        # mode only: its transmittance loop runs all 64 steps
        # unconditionally (no early exit in raymarch.glsl), so dead
        # width is paid in full — measured -24.5% (4.27 -> 3.22
        # s/sample, 1080p/512^3 filled, examples/profile_filled.py
        # raymarch_tile_csec arm). For the early-exit DDA/tracking
        # loops the march ladder already narrows in-loop and the flag
        # measured a wash-to-loss (NOTES r9), so "auto" keeps it OFF.
        self.compact_secondary = compact_secondary
        self.settings = settings or ViewerSettings()

        self.camera = Camera(1.0)
        self.environment: Environment = default_environment()
        self.volume: Volume | None = None
        self.density_scale: float = 1.0
        self.grid: BrickGrid | None = None
        self._device_grid = None

        self._transfer_colors = [dict(c) for c in DEFAULT_COLOR_STOPS]
        self._transfer_type = "color_stops"
        self._lut = jnp.asarray(generate_transfer_function(self._transfer_colors))

        self.frame_index = 0
        self._framebuffer = jnp.zeros((self.height * self.width, 3), jnp.float32)
        self._cached_operands = None
        self._warmup_preview = None

        # error handling (viewer.ts:797-821): a failed load suspends
        # rendering and gates further restarts until cleared
        self.errored: bool = False
        self.last_error: Exception | None = None
        self.suspend: bool = False
        # clip-overlay interaction state for image(show_clipping=True)
        self.show_clipping: bool = True
        self.clip_controller = None  # created lazily on first use

    @classmethod
    def from_attributes(
        cls,
        width: int = 1920,
        height: int = 1080,
        zip_path=None,
        files_dir=None,
        settings_path=None,
        env_path=None,
        render_mode: str | None = None,
        benchmark_path=None,
        zip_url: str | None = None,
        env_url: str | None = None,
    ) -> "Renderer":
        """Declarative construction — the embed-attribute contract
        (data-zip-url / data-urls / data-settings-url / data-env-url /
        data-render-mode / data-benchmark-url, viewer.ts:112,
        index.html:24-33), with local paths OR http(s) URLs.

        `zip_url` / `env_url` fetch over HTTP like the reference's
        restartFromZipUrl / loadEnvFromUrl (viewer.ts:991-1003,1035-1040);
        the corresponding `*_path` argument wins if both are given.

        `benchmark_path` mirrors `attributeBenchmark` (viewer.ts:840-848):
        after construction the benchmark collection is run immediately and
        the results are stored on the renderer as `last_benchmark`."""
        from pathlib import Path

        r = cls(width=width, height=height)
        if zip_path is not None:
            r.restart_from_zip(Path(zip_path).read_bytes())
        elif files_dir is not None:
            paths = sorted(p for p in Path(files_dir).iterdir() if p.is_file())
            r.restart_from_files(paths)
        elif zip_url is not None:
            r.restart_from_zip(_fetch_url(zip_url))
        if env_path is not None:
            r.load_env(Path(env_path).read_bytes())
        elif env_url is not None:
            r.load_env(_fetch_url(env_url))
        if settings_path is not None:
            from volxel_tpu.api.settings import load_settings

            r.restore_settings(load_settings(Path(settings_path)))
        if render_mode is not None:
            r.render_mode = render_mode
        if benchmark_path is not None:
            import json

            from volxel_tpu.api.benchmark import run_benchmark_collection

            spec = json.loads(Path(benchmark_path).read_text())
            base = Path(benchmark_path).parent

            def _load(rel):
                p = base / rel
                return p.read_bytes() if p.exists() else None

            r.last_benchmark = run_benchmark_collection(
                spec, r, load_zip=_load, load_env=_load
            )
        return r

    # -- volume loading (viewer.ts:963-1017, 1080-1145) ------------------------

    def handle_error(self, error: Exception) -> None:
        """Central error sink: suspend rendering, keep the error
        (reference handleError, viewer.ts:797-821)."""
        self.errored = True
        self.last_error = error
        self.suspend = True

    def clear_error(self) -> None:
        self.errored = False
        self.last_error = None
        self.suspend = False

    def restart_from_grid(self, grid: BrickGrid) -> None:
        """setupFromGrid: reset clip/scale, unit-cube rescale, upload."""
        if self.errored:
            return  # restarts are gated while errored (viewer.ts:1156)
        self.grid = grid
        self.density_scale = 1.0
        self.settings.volume_clip_min = [0.0, 0.0, 0.0]
        self.settings.volume_clip_max = [1.0, 1.0, 1.0]
        self.volume = Volume.from_grid(grid)
        self.density_scale *= self.volume.rescale_to_unit_cube()
        self._device_grid = device_grid_from_brick(
            grid, maj_dtype=self.maj_dtype
        )
        dense = self._device_grid.dense
        octo = self.octo_decode
        if octo == "auto":
            from volxel_tpu.render.sampling import OCTO_BUDGET_BYTES

            octo = dense is not None and dense.size * 16 <= OCTO_BUDGET_BYTES
        if octo and dense is not None:
            import jax

            from volxel_tpu.render.sampling import pack_dense_octo

            self._device_grid = self._device_grid._replace(
                dense_octo=jax.jit(pack_dense_octo)(self._device_grid.dense)
            )
        elif self.quad_decode and self._device_grid.dense is not None:
            import jax

            from volxel_tpu.render.sampling import pack_dense_quads

            self._device_grid = self._device_grid._replace(
                dense_quad=jax.jit(pack_dense_quads)(self._device_grid.dense)
            )
        elif self.pair_decode and self._device_grid.dense is not None:
            import jax

            from volxel_tpu.render.sampling import pack_dense_pairs

            self._device_grid = self._device_grid._replace(
                dense_pair=jax.jit(pack_dense_pairs)(self._device_grid.dense)
            )
        self.restart_rendering()

    def restart_from_files(self, sources: list) -> None:
        try:
            self.restart_from_grid(read_dicoms_to_grid(sources))
        except Exception as e:
            self.handle_error(e)
            raise

    def restart_from_zip(self, source) -> None:
        try:
            self.restart_from_grid(read_zip_to_grid(source))
        except Exception as e:
            self.handle_error(e)
            raise

    # -- environment (viewer.ts:1019-1040, 1074-1078) --------------------------

    def load_env(self, data: bytes, strength: float | None = None) -> None:
        image = decode_env_bytes(data)
        self.environment = Environment(
            image, strength if strength is not None else self.environment.strength
        )
        self.restart_rendering()

    def load_env_default(self) -> None:
        self.environment = default_environment()
        self.restart_rendering()

    @property
    def env_strength(self) -> float:
        return self.environment.strength

    @env_strength.setter
    def env_strength(self, value: float) -> None:
        self.environment.with_strength(float(value))
        self.restart_rendering()

    # -- transfer function ------------------------------------------------------

    def set_transfer_colors(self, colors: list[dict]) -> None:
        self._transfer_colors = [dict(c) for c in colors]
        self._transfer_type = "color_stops"
        self._lut = jnp.asarray(generate_transfer_function(self._transfer_colors))
        self.restart_rendering()

    def set_transfer_full(self, rgba_rows) -> None:
        self._transfer_colors = [list(r) for r in rgba_rows]
        self._transfer_type = "full"
        self._lut = jnp.asarray(np.asarray(rgba_rows, dtype=np.float32))
        self.restart_rendering()

    def load_transfer_function(self, text: str) -> None:
        """Load an `r g b density` text transfer function (data.ts:5-14)."""
        from volxel_tpu.transfer.function import parse_transfer_function

        rows = parse_transfer_function(text)
        if not rows:
            raise ValueError("No transfer function rows parsed")
        self.set_transfer_full(rows)

    # -- render mode (viewer.ts:1442-1452) --------------------------------------

    @property
    def render_mode(self) -> str:
        return self.settings.render_mode

    @render_mode.setter
    def render_mode(self, mode: str) -> None:
        if mode not in ("default", "no_dda", "raymarch"):
            raise ValueError(f"Unknown render mode: {mode}")
        self.settings.render_mode = mode
        self.restart_rendering()

    # -- progressive loop (viewer.ts:1155-1293) ---------------------------------

    def restart_rendering(self) -> None:
        self.frame_index = 0
        # any visual-state change flows through here (reference
        # restartRendering semantics), so the cached device operands for
        # the jitted render are invalidated exactly when they can change
        self._cached_operands = None

    def _render_warmup_preview(self) -> None:
        """One low-res warm-up sample (0.33 resolutionFactor) into the
        display-only preview buffer; each frame replaces the previous
        (the reference's warm-up frames have sample_weight 0)."""
        full = self._config()
        w = max(1, round(full.width * 0.33))
        h = max(1, round(full.height * 0.33))
        config = full._replace(
            width=w, height=h, chunk_size=self._pick_chunk_size(w * h)
        )
        inv_view = jnp.asarray(
            np.linalg.inv(self.camera.view_matrix()).astype(np.float32)
        )
        inv_proj = jnp.asarray(
            np.linalg.inv(self.camera.proj_matrix(full.width / full.height)).astype(
                np.float32
            )
        )
        sample = render_sample(
            config,
            self._device_grid,
            self.volume_params(),
            self._lut,
            self.environment.state,
            inv_view,
            inv_proj,
            jnp.asarray(self.settings.light_dir, jnp.float32),
            jnp.uint32(self.frame_index),
        )
        self._warmup_preview = (w, h, sample)

    def _render_dims(self) -> tuple[int, int]:
        factor = float(self.settings.resolution_factor)
        return max(1, round(self.width * factor)), max(1, round(self.height * factor))

    @staticmethod
    def _pick_chunk_size(n: int, target: int = 129600) -> int | None:
        """Largest divisor of n at most ~target (wavefront chunking).

        Chunking lets coherent pixel blocks exit traversal loops at their
        local worst case instead of the global one, and bounds worst-case
        compile size + memory (2M-lane monolithic programs have crashed
        the TPU worker). Target history: 16200 was the optimum when march
        cost was width x local-max-steps (examples/ab_chunk2.py: 0.72
        s/sample vs 2.75 at 129600); the march_ladder narrows the loop to
        the running count, absorbing in-chunk divergence, which moves the
        optimum up (examples/ab_ladder*.py: 0.426 at 16200, 0.378 at
        129600, 0.352 unchunked). 129600 keeps most of the win while
        preserving the compile/memory bound; pass chunk_size=None through
        RenderConfig for the last ~7% on small frames.
        """
        if n <= target:
            return None
        k = -(-n // target)  # smallest chunk count with chunks <= target
        while k <= n and n % k != 0:
            k += 1
        size = n // k
        return size if size < n else None

    def _config(self) -> RenderConfig:
        w, h = self._render_dims()
        return RenderConfig(
            width=w,
            height=h,
            chunk_size=self._pick_chunk_size(w * h),
            mode=self.settings.render_mode,
            bounces=int(self.settings.bounces),
            show_environment=bool(self.settings.show_environment),
            use_env=bool(self.settings.use_env),
            debug_hits=bool(self.settings.debug_hits),
            gradient_shading=bool(self.settings.gradient_shading),
            physical_shadows=bool(self.settings.physical_shadows),
            physical_majorant=bool(self.settings.physical_majorant),
            physical_pdf=bool(self.settings.physical_pdf),
            premul_majorant=self.premul_majorant,
            compact_secondary=(
                self.settings.render_mode == "raymarch"
                if self.compact_secondary == "auto"
                else bool(self.compact_secondary)
            ),
            compact_decode=self.compact_decode,
            march_ladder=self.march_ladder,
            mxu_gather=self._resolve_mxu_gather(),
            tile_march=self._resolve_tile_march(),
        )

    def _resolve_mxu_gather(self) -> bool:
        """Resolve mxu_gather="auto" to a concrete bool.

        "auto" is OFF: the honest sync-mode chip A/B (examples/ab_mxu.py
        r9, 960x540/256^3, 3 passes reproducible to <1%) measured the
        MXU one-hot gather a LOSS at every shipped site — march majorant
        alone +2.1%, all sites +5.3% vs the warp-table baseline. The
        per-iteration pallas_call + N*T one-hot MACs inside the
        while_loop body cost more than XLA's serialized per-lane gather
        at VMEM-small table sizes. The kernel stays available
        (mxu_gather=True) for table/width regimes where the tradeoff
        could flip, and remains bit-exact by construction."""
        if self.mxu_gather != "auto":
            return bool(self.mxu_gather)
        return False

    def _resolve_tile_march(self) -> bool:
        """Resolve tile_march="auto" to a concrete bool: ON for the TPU
        backend (raymarch mode only engages it — see RenderConfig), OFF
        on CPU where the interpreted kernel is strictly slower."""
        if self.tile_march != "auto":
            return bool(self.tile_march)
        import jax as _jax

        return _jax.default_backend() == "tpu"

    def volume_params(self) -> VolumeParams:
        """bindUniforms volume block (viewer.ts:1324-1345)."""
        if self.volume is None:
            raise RuntimeError("No volume loaded")
        lo, hi = self.volume.aabb_clipped(
            self.settings.volume_clip_min, self.settings.volume_clip_max
        )
        vmin, vmaj = self.volume.min_maj
        scale = self.density_scale * self.settings.density_multiplier
        maj = vmaj * scale
        return VolumeParams(
            aabb_lo=jnp.asarray(lo),
            aabb_hi=jnp.asarray(hi),
            transform_inv=jnp.asarray(
                np.linalg.inv(self.volume.combined_transform()).astype(np.float32)
            ),
            vol_min=jnp.float32(vmin * scale),
            vol_maj=jnp.float32(maj),
            inv_maj=jnp.float32(1.0 / maj),
            density_scale=jnp.float32(scale),
            albedo=jnp.full((3,), 0.9, jnp.float32),  # viewer.ts:1337
            phase_g=jnp.float32(0.0),  # viewer.ts:1338
            sample_range=jnp.asarray(self.settings.sample_range, jnp.float32),
        )

    def render_dvr(
        self, use_pallas: bool | None = None, screen: bool = False
    ) -> np.ndarray:
        """Deterministic shear-warp DVR preview of the current view.

        Extension beyond the reference: a single-pass absorption-emission
        render (render/shearwarp.py — the Pallas fast path) for instant
        previews while the Monte-Carlo modes converge. With screen=False
        returns the tonemapped intermediate (sheared-space) image; with
        screen=True applies the warp half of shear-warp and returns a
        (height, width, 3) image aligned with the camera (row 0 = top) —
        what the interactive server streams during drags.
        """
        if self._device_grid is None or self._device_grid.dense is None:
            raise RuntimeError("DVR preview needs a loaded dense volume")
        from volxel_tpu.render.pathtrace import tonemap
        from volxel_tpu.render.shearwarp import render_dvr as _dvr
        from volxel_tpu.render.shearwarp import warp_to_screen

        # view direction in index space: the camera forward axis
        forward = self.camera.view - self.camera.pos
        m = np.linalg.inv(self.volume.combined_transform().astype(np.float64))
        d_index = m[:3, :3] @ forward
        scale = float(self.density_scale * self.settings.density_multiplier)
        c, t = _dvr(
            self._device_grid.dense,
            self._lut,
            d_index,
            vol_maj=1.0,
            density_scale=scale,
            use_pallas=use_pallas,
        )
        if screen:
            w, h = self._render_dims()
            # occupied-region center (voxels) from the brick ranges: keeps
            # the warp's reference plane on the data when mip alignment
            # pads the index box far past it
            occ = np.asarray(self.grid.range_hi) > 0
            if occ.any():
                zs, ys, xs = np.nonzero(occ)
                mid = np.array(
                    [
                        (zs.min() + zs.max() + 1) * 4.0,  # brick -> voxel mid
                        (ys.min() + ys.max() + 1) * 4.0,
                        (xs.min() + xs.max() + 1) * 4.0,
                    ]
                )
            else:
                mid = None
            c = warp_to_screen(
                c,
                t,
                d_index,
                tuple(int(v) for v in self._device_grid.dense.shape),
                self.volume.combined_transform().astype(np.float64),
                self.camera.view_matrix().astype(np.float64),
                self.camera.proj_matrix(w / h).astype(np.float64),
                w,
                h,
                occupied_mid=mid,
            )
        img = tonemap(
            c,
            jnp.float32(self.settings.exposure),
            jnp.float32(self.settings.gamma),
        )
        return np.asarray(jnp.clip(img, 0.0, 1.0))

    def render_preview(
        self, use_pallas: bool | None = None, scale: float = 1.0
    ) -> np.ndarray:
        """Interactive shear-warp preview: camera-aligned, tonemapped,
        (height, width, 3), row 0 = top.

        Unlike render_dvr this path NEVER recompiles per camera angle:
        the intermediate canvas is fixed at worst-case shear and the
        shear/homography parameters are traced, so at most 6 permutation
        variants compile, then every drag tick is a cached dispatch. The
        permuted volume is cached per principal axis.
        """
        if self._device_grid is None or self._device_grid.dense is None:
            raise RuntimeError("preview needs a loaded dense volume")
        import jax

        from volxel_tpu.render.shearwarp import _preview_jit, preview_homography

        w, h = self._render_dims()
        if scale != 1.0:
            w, h = max(1, round(w * scale)), max(1, round(h * scale))
        forward = self.camera.view - self.camera.pos
        minv = np.linalg.inv(self.volume.combined_transform().astype(np.float64))
        d_index = minv[:3, :3] @ forward

        occ = np.asarray(self.grid.range_hi) > 0
        if occ.any():
            zs, ys, xs = np.nonzero(occ)
            mid = np.array(
                [
                    (zs.min() + zs.max() + 1) * 4.0,
                    (ys.min() + ys.max() + 1) * 4.0,
                    (xs.min() + xs.max() + 1) * 4.0,
                ]
            )
        else:
            mid = None
        perm, flip, sx, sy, h_mat = preview_homography(
            d_index,
            tuple(int(v) for v in self._device_grid.dense.shape),
            self.volume.combined_transform().astype(np.float64),
            self.camera.view_matrix().astype(np.float64),
            self.camera.proj_matrix(w / h).astype(np.float64),
            w,
            h,
            occupied_mid=mid,
        )
        cache = getattr(self, "_preview_vol_cache", None)
        if cache is None or cache[0] is not self._device_grid.dense:
            cache = (self._device_grid.dense, {})
            self._preview_vol_cache = cache
        key = (perm, flip)
        if key not in cache[1]:
            vol = jnp.transpose(self._device_grid.dense, perm)
            if flip:
                vol = vol[::-1]
            cache[1][key] = jax.device_put(vol)
        vol = cache[1][key]

        scale = float(self.density_scale * self.settings.density_multiplier)
        sigma_dt = scale * float(np.sqrt(1.0 + sx * sx + sy * sy))
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        img = _preview_jit(
            vol,
            self._lut,
            jnp.float32(sx),
            jnp.float32(sy),
            jnp.float32(1.0),
            jnp.float32(sigma_dt),
            jnp.asarray(h_mat),
            jnp.asarray([0.04, 0.04, 0.05], jnp.float32),
            jnp.float32(self.settings.exposure),
            jnp.float32(self.settings.gamma),
            width=w,
            height=h,
            use_pallas=bool(use_pallas),
        )
        return np.asarray(img)

    def _operand_grid(self):
        """The grid operand for jitted renders (hook: DistributedRenderer
        returns the slab-sharded volume when vz > 1)."""
        return self._device_grid

    def _prime_operands(self, config: RenderConfig):
        """Build (or return) the cached device operand tuple.

        Factored out of render_frame so batch paths can prime the cache
        without triggering the warm-up preview branch (which renders a
        display-only low-res frame and never builds operands)."""
        if self._cached_operands is None:
            # upload scene uniforms once per state change, not per frame —
            # per-frame host->device puts dominate on tunneled backends
            w, h = config.width, config.height
            inv_view = jnp.asarray(
                np.linalg.inv(self.camera.view_matrix()).astype(np.float32)
            )
            inv_proj = jnp.asarray(
                np.linalg.inv(self.camera.proj_matrix(w / h)).astype(np.float32)
            )
            self._cached_operands = (
                config,
                self._operand_grid(),
                self.volume_params(),
                self._lut,
                self.environment.state,
                inv_view,
                inv_proj,
                jnp.asarray(self.settings.light_dir, jnp.float32),
            )
        return self._cached_operands

    def maybe_sync_light(self) -> None:
        """Backlight mode (viewer.ts:789-795): when syncLightDir is on,
        the light points from the camera toward the look-at target."""
        if self.settings.sync_light_dir:
            diff = self.camera.view - self.camera.pos
            self.settings.light_dir = [float(-v) for v in diff]
            self.restart_rendering()

    def sample_weight(self) -> float:
        """viewer.ts:1356"""
        f = self.frame_index
        if f < LOW_RESOLUTION_DURATION:
            return 0.0
        return (f - LOW_RESOLUTION_DURATION) / (f - LOW_RESOLUTION_DURATION + 1)

    def render_frame(self):
        """Render one progressive sample and fold it into the accumulator.

        Returns the accumulated (linear, pre-tonemap) framebuffer.
        """
        if self._device_grid is None:
            raise RuntimeError("No volume loaded")
        if self.errored:
            raise RuntimeError(
                "Renderer is in an error state (clear_error() to resume)"
            ) from self.last_error
        if self.suspend:
            return self._framebuffer
        config = self._config()
        if (
            self.settings.warmup_low_res
            and self.frame_index < LOW_RESOLUTION_DURATION
        ):
            # reference warm-up (viewer.ts:132,1185-1188): the first 5
            # frames render at 0.33 resolution. They have zero
            # accumulation weight, so only the displayed preview is
            # affected; the main framebuffer starts at sample 5 exactly
            # as in the full-res path.
            self._render_warmup_preview()
            self.frame_index += 1
            return self._framebuffer
        self._warmup_preview = None
        n = config.width * config.height
        if self._framebuffer.shape[0] != n:
            self._framebuffer = jnp.zeros((n, 3), jnp.float32)

        self._prime_operands(config)
        fi = jnp.uint32(self.frame_index)
        sample = render_sample(*self._cached_operands, fi)
        self._framebuffer = accumulate_progressive(self._framebuffer, sample, fi)
        self.frame_index += 1
        return self._framebuffer

    def render(self, samples: int | None = None, batch: int = 16):
        """Render `samples` progressive frames (or maxSamples) and return
        the tonemapped image.

        Converged-image semantics match the per-frame loop exactly: the
        reference's warm-up weighting (viewer.ts:1356) telescopes to the
        plain mean of samples [5, N), so batches of samples are rendered
        in single dispatches (render_sample_batch) and mean-combined
        on-device — dispatch count drops by ~batch x.
        """
        from volxel_tpu.render.pathtrace import WARMUP_SAMPLES, render_sample_batch

        total = samples if samples is not None else self.settings.max_samples
        if total <= WARMUP_SAMPLES + 1:
            for _ in range(total):
                self.render_frame()
            return self.image()

        # prime operand cache (and shape-check the accumulator). NOT via
        # render_frame(): with warmup_low_res its first frames take the
        # preview branch and never build operands (advisor r3 finding).
        if self._device_grid is None:
            raise RuntimeError("No volume loaded")
        config = self._config()
        n = config.width * config.height
        if self._framebuffer.shape[0] != n:
            self._framebuffer = jnp.zeros((n, 3), jnp.float32)
        operands = self._prime_operands(config)

        first = WARMUP_SAMPLES
        count = 0
        buffer = self._framebuffer
        f = first
        while f < total:
            k = min(batch, total - f)
            mean_k = render_sample_batch(k, *operands, jnp.uint32(f))
            buffer = (count * buffer + k * mean_k) / (count + k)
            count += k
            f += k
        self._framebuffer = buffer
        self.frame_index = total
        return self.image()

    def image(self, show_clipping: bool = False) -> np.ndarray:
        """Tonemapped (height, width, 3) float32 image, row 0 = top.

        show_clipping overlays the clip-box wireframe with the hovered/
        held face highlighted (the reference's clipping cube pass,
        viewer.ts:1267-1288).
        """
        from volxel_tpu.render.pallas_ops import tonemap_display

        config = self._config()
        preview = getattr(self, "_warmup_preview", None)
        if preview is not None and self.frame_index <= LOW_RESOLUTION_DURATION:
            # warm-up display: upsample the low-res preview to full size
            w, h, sample = preview
            img = tonemap_display(
                sample, self.settings.exposure, self.settings.gamma
            )
            img = np.asarray(img).reshape(h, w, 3)[::-1]
            ry = -(-config.height // h)
            rx = -(-config.width // w)
            img = np.repeat(np.repeat(img, ry, axis=0), rx, axis=1)[
                : config.height, : config.width
            ]
        else:
            img = tonemap_display(
                self._framebuffer, self.settings.exposure, self.settings.gamma
            )
            img = np.asarray(img).reshape(config.height, config.width, 3)
            img = img[::-1]  # GL row 0 is the bottom
        if show_clipping and self.volume is not None:
            from volxel_tpu.utils.overlay import draw_clip_box

            lo, hi = self.volume.aabb_clipped(
                self.settings.volume_clip_min, self.settings.volume_clip_max
            )
            ctl = self.clip_controller
            img = draw_clip_box(
                img,
                lo,
                hi,
                self.camera.view_matrix(),
                self.camera.proj_matrix(config.width / config.height),
                selected_face=getattr(ctl, "_last_face", None) if ctl else None,
                adjusting=getattr(ctl, "adjusting", False) if ctl else False,
            )
        return img

    def make_clip_controller(self):
        """Attach and return a ClipBoxController for interactive editing."""
        from volxel_tpu.scene.interaction import ClipBoxController

        self.clip_controller = ClipBoxController(self)
        return self.clip_controller

    def raw_image(self) -> np.ndarray:
        """Linear accumulated radiance, (height, width, 3), row 0 = top."""
        config = self._config()
        return np.asarray(self._framebuffer).reshape(config.height, config.width, 3)[
            ::-1
        ]

    # -- settings import/export (viewer.ts:626-762) ------------------------------

    def export_settings(self) -> dict:
        return make_settings_export(
            self.settings,
            transfer_colors=self._transfer_colors,
            transfer_type=self._transfer_type,
            histogram_range=self.settings.sample_range,
            env_strength=self.environment.strength,
            camera_pos=self.camera.pos,
            camera_look_at=self.camera.view,
        )

    def restore_settings(self, export: dict) -> None:
        """Apply a verified V3 SettingsExport (viewer.ts restoreSettings)."""
        from volxel_tpu.api.settings import verify_settings

        export = verify_settings(export)
        tr = export["transfer"]
        self.settings.density_multiplier = tr["densityMultiplier"]
        self.settings.sample_range = list(tr["histogramRange"])
        if tr["transfer"]["type"] == "color_stops":
            self.set_transfer_colors(tr["transfer"]["colors"])
        else:
            self.set_transfer_full(tr["transfer"]["colors"])

        disp = export["display"]
        self.settings.max_samples = int(disp["samples"])
        self.settings.bounces = int(disp["bounces"])
        self.settings.gamma = disp["gamma"]
        self.settings.exposure = disp["exposure"]
        self.settings.debug_hits = disp["debugHits"]
        self.settings.render_mode = disp["renderMode"]
        self.settings.resolution_factor = disp["resolutionFactor"]

        light = export["lighting"]
        self.settings.use_env = light["useEnv"]
        self.settings.show_environment = light["showEnv"]
        self.environment.with_strength(light["envStrength"])
        self.settings.sync_light_dir = light["syncLightDir"]
        self.settings.light_dir = list(light["lightDir"])

        other = export["other"]
        self.camera.pos = np.asarray(other["cameraPos"], np.float64)
        self.camera.view = np.asarray(other["cameraLookAt"], np.float64)
        self.settings.volume_clip_min = list(other["clipMin"])
        self.settings.volume_clip_max = list(other["clipMax"])
        self.restart_rendering()
