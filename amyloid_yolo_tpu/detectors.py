"""End-to-end tile inference: the framework's flagship compiled pipeline.

One ``jit``-compiled function takes a batch of raw uint8 WSI tiles and
returns final detections in tile pixel space:

    uint8 (B, 1536, 1536, 3)
      → on-device letterbox/nearest-resize/scale        (ops.preprocess)
      → Darknet-53 + heads, BN-folded bf16 on the MXU   (models.darknet)
      → anchor decode                                    (models.heads)
      → merging NMS, fixed capacity                      (ops.nms)
      → rescale to tile space                            (ops.boxes)
    → (B, K, 7) boxes + (B, K) validity

This collapses the reference's detect path (``detect.py:88-139`` +
``validation.py:100-129``: host PIL preprocess → GPU forward → host NMS →
host rescale) into a single device program with one host↔device round trip
per batch.

The optional domain post-passes (union merge, CAA-filter) are applied by
:class:`Detector.postprocess` with exact reference semantics
(:mod:`amyloid_yolo_tpu.ops.merge`, :mod:`amyloid_yolo_tpu.domain`).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .graphspec import GraphSpec, yolov3_spec
from .io.datasets import ImageFolder
from .models import darknet, heads
from .ops import nms as nms_ops
from .ops.boxes import rescale_boxes_jnp
from .ops.preprocess import preprocess_tiles


def resolve_batch_size(batch_size, n_images: int) -> int:
    """Resolve a ``--batch_size`` value that may be ``"auto"``.

    ``"auto"`` picks the measured-faster batch 32 when the work queue is
    deep enough to fill it (≥ 2 full batches — 2205 vs 1935 tiles/s at
    batch 16, BENCH.md "batch scaling") and the reference-parity batch 16
    otherwise (short queues would pay b32's padding + a second program
    compile for nothing).  Integers and numeric strings pass through.
    """
    if isinstance(batch_size, str):
        if batch_size.strip().lower() == "auto":
            return 32 if n_images >= 64 else 16
        return int(batch_size)
    return int(batch_size)


class Detector:
    """Compiled batched tile detector.

    Args:
      spec: model graph (defaults to the 2-class YOLOv3).
      params: *unfolded* eval params (BN stats included); folding happens
        here so imported reference weights work directly.
      conf_thres / nms_thres: reference operating point is 0.8 / 0.4
        (``README.md:39``).
      capacity: fixed per-tile detection budget after NMS.  Unlike the
        reference's uncapped Python loop, at most ``capacity`` detections
        are returned per tile; and only the top ``nms_pool`` conf-passing
        candidates participate in suppression / the confidence-weighted
        merge.  At the 0.8 operating point real tiles produce far fewer
        than 64 conf-passing boxes, so the default pool is exact in
        practice; raise ``nms_pool`` (e.g. 256) for low-conf sweeps.
      nms_pool: pre-NMS candidate pool size (default = ``capacity``).
      compute_dtype: bf16 by default — the MXU-native inference dtype.
      precision: ``"bf16"`` (default, box-for-box parity),
        ``"int8_early"`` — the HBM-bound high-resolution backbone stage
        runs with int8 activations (and int8 MXU convs unless
        ``int8_compute=False``) using static scales calibrated on the
        first batch (or via :meth:`calibrate`) — or ``"int8_full"`` —
        int8 through the whole graph including the FPN tail, only the
        three linear head convs staying bf16.  Non-parity fast paths;
        measure the accuracy delta on your data before adopting
        (``tools/fastpath_gate.py``).
    """

    def __init__(
        self,
        spec: Optional[GraphSpec] = None,
        params=None,
        *,
        conf_thres: float = 0.8,
        nms_thres: float = 0.4,
        model_size: int = 416,
        tile_size: int = 1536,
        capacity: int = 64,
        nms_pool: Optional[int] = None,
        compute_dtype=jnp.bfloat16,
        fold_bn: bool = True,
        host_resize: bool = False,
        mesh=None,
        precision: str = "bf16",
        int8_compute: bool = True,
        int8_downsample: int = 4,
        pallas_blocks: bool = False,
        approx_topk: bool = False,
        lazy_decode: bool = True,
        s2d_stem: bool = False,
        s2d_downsample: bool = False,
        int32_accum_max_hw: int = 0,
        calib_percentile: float = 100.0,
    ):
        self.spec = spec or yolov3_spec(num_classes=2)
        if params is None:
            params = darknet.init_params(jax.random.PRNGKey(0), self.spec)
        self.params = darknet.fold_batchnorm(params, self.spec) if fold_bn else params
        self.fold_bn = fold_bn
        self.conf_thres = conf_thres
        self.nms_thres = nms_thres
        # approx_topk: select the NMS candidate pool with the TPU-native
        # approx_max_k PartialReduce instead of an exact sort.  Non-parity
        # fast path; accuracy-gated on the real prospective set (see
        # ops/nms.py docstring + BENCH.md).
        self.approx_topk = approx_topk
        # lazy_decode: score → top-k → sparse decode (heads.decode_topk)
        # instead of decoding all ~10.6k anchor rows densely.  Bit-identical
        # outputs to the dense path (same ops on the selected rows, same
        # tie order — tests/test_heads_lazy.py; TPU gate, two trained
        # ckpts: 200/200 identical @ 0.09 px max drift (fastpath_gate/),
        # count-identical 200/200 with one image at ≤3 px drift
        # (fastpath_gate_final/) — bf16 fusion rounding), so it is the
        # DEFAULT parity pipeline since r4 (wash at b32, faster at b16);
        # lazy_decode=False keeps the dense decode for A/B.
        self.lazy_decode = lazy_decode
        self.model_size = model_size
        self.tile_size = tile_size
        self.capacity = capacity
        self.nms_pool = nms_pool or capacity
        self.compute_dtype = compute_dtype
        if precision not in ("bf16", "int8_early", "int8_full"):
            raise ValueError(f"unknown precision {precision!r}")
        if precision.startswith("int8") and not fold_bn:
            raise ValueError(f"{precision} requires fold_bn=True")
        self.precision = precision
        self.int8_compute = int8_compute
        # int8_full deep-stage accumulator: int32 for conv outputs ≤ this
        # wide, bf16 above; default 0 = all-bf16, the gated configuration
        # (end-to-end wash — darknet.apply_folded_int8_full docstring)
        self.int32_accum_max_hw = int32_accum_max_hw
        # int8 activation-scale statistic: 100 = amax (classic); below 100,
        # that percentile of |activations| — outliers saturate (clipped)
        # instead of widening the whole layer's grid.  Gate per checkpoint:
        # tools/int8_calib_study.py / BENCH.md "int8 calibration".
        self.calib_percentile = float(calib_percentile)
        self._int8_upto = (darknet.int8_region(self.spec, int8_downsample)
                           if precision == "int8_early" else 0)
        if precision == "int8_early":
            self._qparams = darknet.quantize_folded_int8(
                self.params, self.spec, self._int8_upto)
        elif precision == "int8_full":
            self._qparams = darknet.quantize_folded_int8_full(
                self.params, self.spec)
        else:
            self._qparams = None
        self._act_scales: Optional[Dict[str, float]] = None
        # pallas_blocks: replace every fusible residual unit with the fused
        # Pallas kernel (conv1x1+leaky → conv3x3+leaky → add in one VMEM
        # pass — pallas/conv_block.py).  bf16 path only; numerics match the
        # XLA path to bf16 rounding (not bit-exact: the 3x3 accumulates in
        # f32 via taps instead of XLA's conv schedule).
        if pallas_blocks and precision != "bf16":
            raise ValueError("pallas_blocks currently supports precision='bf16'")
        if pallas_blocks and not fold_bn:
            raise ValueError("pallas_blocks requires fold_bn=True")
        self.pallas_blocks = pallas_blocks
        # s2d_stem: space-to-depth restructure of layers 0-1 (same math,
        # MXU-shaped — darknet.make_s2d_stem).  Near-parity fast path: the
        # only numeric delta is float summation order (int8 conv_b reuses
        # conv_1's integer weights verbatim); not bit-exact, so opt-in.
        if s2d_stem and precision == "int8_early":
            raise ValueError("s2d_stem supports precision 'bf16' (fold_bn) "
                             "and 'int8_full'")
        if s2d_stem and not fold_bn:
            raise ValueError("s2d_stem requires fold_bn=True")
        self.s2d_stem = s2d_stem
        # s2d_downsample: relabel the narrow-input 3x3/s2 conv_5 onto the
        # s2d grid too (identical integer products).  Measured 4.5% SLOWER
        # end-to-end (8.20 vs 7.85 ms/batch-16: the int8 space-to-depth
        # transpose of the 208²x64 map outweighs the better MXU tiling —
        # BENCH.md "s2d downsample relabel"), so default OFF; kept as a
        # tested opt-in for hardware where the trade flips.
        if s2d_downsample and not (s2d_stem and precision == "int8_full"):
            raise ValueError("s2d_downsample requires s2d_stem=True and "
                             "precision='int8_full'")
        self._s2d_downs = (
            darknet.make_s2d_down_int8(self._qparams, self.spec)
            if s2d_downsample and precision == "int8_full" else None)
        if s2d_stem and precision == "int8_full":
            self._s2d_params = darknet.make_s2d_stem_int8(
                self.params, self._qparams, self.spec)
        elif s2d_stem:
            self._s2d_params = darknet.make_s2d_stem(self.params, self.spec)
        else:
            self._s2d_params = None
        # min_ch=128 keeps the 208²-map stage on the XLA path (its whole-
        # image VMEM footprint exceeds the v5e budget; see pack_pallas_blocks)
        self._pallas_packs = (darknet.pack_pallas_blocks(
            self.params, self.spec, min_ch=128) if pallas_blocks else None)
        # host_resize: the nearest resize is a pure index gather, so it can
        # run host-side on uint8 before transfer with bit-identical results —
        # shrinking host→device traffic ~13x (1536²→416²).  Use it when the
        # host link is thin; keep the on-device resize when PCIe is fat.
        self.host_resize = host_resize
        # mesh: optional jax.sharding.Mesh with a "dp" axis — inference
        # batches shard across chips (the multi-chip WSI sweep: tiles are
        # embarrassingly parallel, scaling is linear over ICI).  Params are
        # replicated; the same jitted program serves 1..N chips.
        self.mesh = mesh
        if mesh is not None:
            from .parallel.mesh import batch_sharding, replicated

            self._batch_sharding = batch_sharding(mesh)
            self.params = jax.device_put(self.params, replicated(mesh))
            if self._qparams is not None:
                self._qparams = jax.device_put(self._qparams, replicated(mesh))
            if self._pallas_packs is not None:
                self._pallas_packs = jax.device_put(self._pallas_packs,
                                                    replicated(mesh))
            if self._s2d_params is not None:
                self._s2d_params = jax.device_put(self._s2d_params,
                                                  replicated(mesh))
        # NMS pool/capacity saturation observability: per-image conf-passing
        # candidate counts come back from every compiled call (~free); the
        # counters make the fixed-capacity trade auditable instead of a
        # silent mAP depressor (the reference loop is uncapped).
        self._last_ncand = None
        self.overflow_images = 0
        self.images_seen = 0
        self.max_candidates_seen = 0
        # int8_early defers compilation until activation scales exist
        # (calibrate() explicitly, or lazily on the first batch)
        self._fn = self._build() if self.precision == "bf16" else None

    def _build(self):
        spec = self.spec
        model_size = self.model_size
        tile_size = self.tile_size
        conf, nmst, cap = self.conf_thres, self.nms_thres, self.capacity
        pool = self.nms_pool
        approx_topk = self.approx_topk
        lazy_decode = self.lazy_decode
        dtype = self.compute_dtype
        fold = self.fold_bn

        host_resize = self.host_resize
        precision = self.precision
        qparams = self._qparams
        act_scales = self._act_scales
        int8_upto = self._int8_upto
        int8_compute = self.int8_compute
        pallas_packs = self._pallas_packs
        s2d_params = self._s2d_params
        s2d_downs = self._s2d_downs
        i32_max_hw = self.int32_accum_max_hw

        @jax.jit
        def run(params, tiles_u8):
            if host_resize:  # input already model_size; just scale to [0,1]
                x = tiles_u8.astype(jnp.float32) / 255.0
            else:
                x = preprocess_tiles(tiles_u8, model_size)
            if precision == "int8_early":
                maps = darknet.apply_folded_int8(
                    params, qparams, act_scales, spec, x,
                    upto=int8_upto, compute_dtype=dtype,
                    int8_compute=int8_compute)
            elif precision == "int8_full":
                maps = darknet.apply_folded_int8_full(
                    params, qparams, act_scales, spec, x,
                    compute_dtype=dtype, s2d_stem=s2d_params,
                    s2d_downs=s2d_downs, int32_accum_max_hw=i32_max_hw)
            elif fold:
                maps = darknet.apply_folded(
                    params, spec, x, compute_dtype=dtype,
                    pallas_packs=pallas_packs, s2d_stem=s2d_params,
                    # Mosaic kernels need a TPU; CPU (tests) interprets
                    pallas_interpret=jax.default_backend() == "cpu")
            else:
                maps, _ = darknet.apply(params, spec, x, compute_dtype=dtype)
            if lazy_decode:
                det, scores, n_cand = heads.decode_topk(
                    maps, spec, model_size, conf, pool or cap,
                    approx_topk=approx_topk, return_count=True)
                dets, valid = nms_ops.non_max_suppression_pooled(
                    det, scores, nmst, cap)
            else:
                pred = heads.decode_all(maps, spec, model_size)
                dets, valid, n_cand = nms_ops.non_max_suppression(
                    pred, conf, nmst, cap, pool=pool, approx_topk=approx_topk,
                    return_count=True)
            dets = rescale_boxes_jnp(dets, model_size, tile_size, tile_size)
            return dets, valid, n_cand

        return run

    # At or below this, an activation-amax was zero: the calibration batch
    # never excited that layer AT ALL (e.g. a blank border tile) and the
    # resulting scale would quantize real data to garbage.  The calibrators
    # floor every scale at amax/127 + 1e-12, so a dead layer lands exactly
    # at 1e-12 — 2e-12 separates that from any genuinely excited layer
    # (even untrained random-init nets bottom out around 1e-10).  Small-
    # but-nonzero amax is deliberately NOT flagged: quantization is
    # relative, and low-gain layers legitimately produce tiny activations.
    DEGENERATE_SCALE = 2e-12

    def calibrate(self, tiles_u8: np.ndarray, *, accumulate: bool = False,
                  rebuild: bool = True) -> Dict[str, float]:
        """Compute static int8 activation scales from a representative batch
        and compile the int8 pipeline (no-op for bf16 precision).

        ``accumulate=True`` takes the elementwise max with previously
        calibrated scales, so calibration can run over several batches::

            for batch in first_k_batches:
                det.calibrate(batch, accumulate=True, rebuild=False)
            det.calibrate(last_batch, accumulate=True)   # compiles once

        With ``calib_percentile < 100`` the accumulated statistic is the
        MAX of the per-batch percentiles — an upper bound on (not equal
        to) the percentile over the union of all batches.  Exact union
        quantiles would need every activation tensor held at once; the
        max-combine keeps calibration streaming and errs toward amax,
        i.e. toward the (default, gated) conservative statistic.

        Degenerate scales (a layer whose amax is ~0 on the calibration
        batch, e.g. an all-black border tile) raise a ``UserWarning`` —
        running with them silently mis-scales every real batch that
        follows.  Pass a representative batch instead.
        """
        if not self.precision.startswith("int8"):
            return {}
        tiles = jnp.asarray(tiles_u8)
        if self.host_resize:
            x = tiles.astype(jnp.float32) / 255.0
        else:
            x = preprocess_tiles(tiles, self.model_size)
        if self.precision == "int8_full":
            scales = darknet.calibrate_act_scales_full(
                self.params, self.spec, x, percentile=self.calib_percentile)
        else:
            scales = darknet.calibrate_act_scales(
                self.params, self.spec, x, self._int8_upto,
                percentile=self.calib_percentile)
        if accumulate and self._act_scales is not None:
            scales = {k: max(v, self._act_scales.get(k, 0.0))
                      for k, v in scales.items()}
        degenerate = sorted(k for k, v in scales.items()
                            if v < self.DEGENERATE_SCALE)
        if degenerate:
            import warnings

            warnings.warn(
                f"int8 calibration produced degenerate (≈0) activation "
                f"scales for layer(s) {degenerate}: the calibration batch "
                f"never excited them (blank tile?).  Detections will be "
                f"garbage — calibrate() with a representative batch, or "
                f"accumulate=True over several.", UserWarning, stacklevel=2)
        self._act_scales = scales
        if rebuild:
            self._fn = self._build()
        else:
            self._fn = None  # recompile lazily with the final scales
        return self._act_scales

    #: persisted-calibration sidecar format tag (save/load_calibration)
    CALIBRATION_FORMAT = "amyolo-int8-calibration-v1"

    def save_calibration(self, path: str, *, meta: Optional[dict] = None) -> str:
        """Persist the calibrated int8 activation scales as a JSON sidecar.

        Round 4 proved calibration is THE int8 accuracy lever (48-tile amax
        0.6838 vs 8-tile 0.657, BENCH.md "int8 calibration sensitivity"),
        yet scales were recomputed from a tile folder on every process
        start — so an accuracy-gated configuration was reproducible only if
        the calibration folder and its iteration order were (r4 verdict
        weak #5).  The sidecar makes the gated artifact self-contained:
        scales + the provenance needed to refuse a mismatched load
        (precision, int8 region, percentile, model geometry).

        ``meta`` is free-form provenance (e.g. the tile-list hash that
        ``detect_folder(save_calibration=...)`` records).
        """
        import json

        if not self.precision.startswith("int8"):
            raise ValueError(f"precision {self.precision!r} has no "
                             "activation scales to save")
        if self._act_scales is None:
            raise ValueError("no calibration to save — run calibrate() / "
                             "_calibrate_from_folder first")
        payload = {
            "format": self.CALIBRATION_FORMAT,
            "precision": self.precision,
            "int8_upto": self._int8_upto,
            "calib_percentile": self.calib_percentile,
            "model_size": self.model_size,
            "tile_size": self.tile_size,
            "host_resize": bool(self.host_resize),
            "n_layers": len(self.spec.layers),
            "scales": {k: float(v) for k, v in self._act_scales.items()},
            "meta": dict(meta if meta is not None
                         else getattr(self, "_calib_meta", {})),
        }
        with open(path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
        return path

    def load_calibration(self, path: str, *, rebuild: bool = True) -> Dict[str, float]:
        """Load a :meth:`save_calibration` sidecar and compile with it.

        Refuses scales recorded under a different quantization graph
        (precision / int8 region / layer count / percentile): those keys
        would silently mis-scale every layer.  Geometry drift (model_size /
        host_resize) only shifts the calibration *distribution*, so it
        warns instead of failing.
        """
        import json
        import warnings

        with open(path) as fh:
            d = json.load(fh)
        if d.get("format") != self.CALIBRATION_FORMAT:
            raise ValueError(f"{path}: not a calibration sidecar "
                             f"(format={d.get('format')!r})")
        for key, want in [("precision", self.precision),
                          ("int8_upto", self._int8_upto),
                          ("n_layers", len(self.spec.layers)),
                          ("calib_percentile", self.calib_percentile)]:
            if d.get(key) != want:
                raise ValueError(
                    f"{path}: calibration was recorded with {key}="
                    f"{d.get(key)!r}, this detector has {want!r} — the "
                    "scales do not correspond to this quantized graph")
        for key, want in [("model_size", self.model_size),
                          ("tile_size", self.tile_size),
                          ("host_resize", bool(self.host_resize))]:
            if d.get(key) != want:
                warnings.warn(
                    f"{path}: calibration was recorded with {key}="
                    f"{d.get(key)!r} but this detector has {want!r}; "
                    "scales remain valid but were measured on a different "
                    "input geometry", UserWarning, stacklevel=2)
        self._act_scales = {k: float(v) for k, v in d["scales"].items()}
        self._calib_meta = {**d.get("meta", {}), "loaded_from": path}
        if rebuild:
            self._fn = self._build()
        else:
            self._fn = None
        return self._act_scales

    #: lazy-calibration sample target for folder runs: 8-tile (one-batch)
    #: calibration under-covers the activation range (see detect_folder)
    CALIB_TILES = 48

    def _calibrate_from_folder(self, folder_ds, batch_size: int) -> None:
        """Calibrate int8 scales on the first ~CALIB_TILES tiles of a
        folder (amax accumulated batch-wise), then compile once.

        Records provenance (tile names + an order-sensitive hash) in
        ``self._calib_meta`` so :meth:`save_calibration` sidecars identify
        exactly which tiles produced the scales."""
        chunks, got, used = [], 0, []
        for _paths, batch, n_valid in folder_ds.iter_batches(batch_size):
            take = min(n_valid, self.CALIB_TILES - got)
            used.extend(_paths[:take])
            c = np.asarray(batch)[:take]
            if len(c) < batch_size:
                # pad by cycling the chunk's REAL tiles: ONE probe shape
                # means ONE compile (each distinct shape is a multi-minute
                # remote compile).  Cycling keeps duplicates ~uniform, so
                # the amax is unchanged and a percentile statistic
                # (calib_percentile < 100) sees every real tile with near-
                # equal weight — repeating only the LAST tile would weight
                # it batch/1 in the quantile.
                pad = c[np.arange(batch_size - len(c)) % len(c)]
                c = np.concatenate([c, pad], axis=0)
            chunks.append(c)
            got += take
            if got >= self.CALIB_TILES:
                break
        if not chunks:
            return
        import hashlib
        import os as _os

        names = [_os.path.basename(str(pp)) for pp in used]
        self._calib_meta = {
            "source": "folder",
            "n_tiles": len(names),
            "tiles_sha256": hashlib.sha256(
                "\n".join(names).encode()).hexdigest(),
            "first_tiles": names[:4],
        }
        for c in chunks[:-1]:
            self.calibrate(c, accumulate=True, rebuild=False)
        self.calibrate(chunks[-1], accumulate=True)

    def __call__(self, tiles_u8: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """tiles (B, tile, tile, 3) uint8 → (dets (B, K, 7), valid (B, K)).

        The per-image conf-passing candidate count (the pool-overflow
        observable) rides along as ``self._last_ncand`` — an unfetched
        device array, so stashing it costs no sync; call
        :meth:`account_overflow` (ragged/folder paths do) to fold it into
        the :attr:`overflow_images`/:attr:`images_seen` counters.
        """
        if self._fn is None:
            if self._act_scales is None:  # int8: calibrate on the first batch
                self.calibrate(tiles_u8)
            else:  # scales exist (calibrate(rebuild=False)): just compile
                self._fn = self._build()
        if self.mesh is not None:
            tiles = jax.device_put(jnp.asarray(tiles_u8), self._batch_sharding)
        else:
            tiles = jnp.asarray(tiles_u8)
        dets, valid, n_cand = self._fn(self.params, tiles)
        self._last_ncand = n_cand
        return dets, valid

    def account_overflow(self, n_valid: Optional[int] = None,
                         n_cand=None) -> int:
        """Fold the latest batch's candidate counts into the overflow
        counters; returns how many of its (first ``n_valid``) images had
        MORE conf-passing candidates than ``nms_pool`` — i.e. images where
        the fixed-capacity trade actually dropped candidates that the
        reference's uncapped loop (``utils/utils.py:235-273``) would have
        kept in the suppression/merge.  Raise ``nms_pool``/``capacity``
        until this stays 0 for exact parity on dense data.
        """
        nc = np.asarray(self._last_ncand if n_cand is None else n_cand)
        if n_valid is not None:
            nc = nc[:n_valid]
        over = int((nc > self.nms_pool).sum())
        self.overflow_images += over
        self.images_seen += int(nc.size)
        self.max_candidates_seen = max(self.max_candidates_seen,
                                       int(nc.max()) if nc.size else 0)
        return over

    # -- host-facing conveniences -------------------------------------------

    def detect_batch_ragged(self, tiles_u8: np.ndarray,
                            n_valid: Optional[int] = None,
                            ) -> List[Optional[np.ndarray]]:
        """``n_valid``: how many leading rows are real images — callers
        that pad partial batches (ImageFolder tail, the serving executor)
        must pass it so padding duplicates don't inflate the pool-overflow
        counters (``overflow_images``/``images_seen``)."""
        dets, valid = self(tiles_u8)
        out = nms_ops.dense_to_ragged(dets, valid)  # sync point
        self.account_overflow(n_valid)
        return out

    def detect_folder(
        self,
        folder: str,
        batch_size=16,
        merge_boxes: bool = False,
        caa_filter=None,
        pipeline_depth: int = 2,
        fast_decode: bool = False,
        background_skip: bool = False,
    ) -> Dict[str, Optional[np.ndarray]]:
        """Run over every image in a folder (reference ``detect.py`` flow).

        ``background_skip=True`` prefilters background tiles before any
        full-size decode (file-size stage + decode-confirm stage,
        :mod:`amyloid_yolo_tpu.io.tissue`) — skipped tiles appear in the
        result dict as ``None`` (no detections), exactly as an inferred
        empty tile would.  Accuracy-gated opt-in
        (``tools/background_gate.py``).

        ``batch_size`` may be an int or ``"auto"`` (batch 32 for deep
        queues, 16 otherwise — :func:`resolve_batch_size`).

        ``caa_filter``: optional callable (path, dets) -> dets implementing
        the consensus-model CAA filter (:func:`amyloid_yolo_tpu.domain.
        CAAFilter`).

        Device dispatch is pipelined ``pipeline_depth`` batches ahead of the
        host-side merge/filter postprocessing (jit calls are async; fetching
        a result is the only sync point), so the chip keeps working while
        the host merges the previous batch — the reference's sweep
        serializes GPU inference against per-image host loops
        (``validation.py:100-129``).
        """
        import collections

        from .ops.boxes import rescale_from_tile_frame
        from .ops.merge import merge_detections

        folder_ds = ImageFolder(
            folder, tile_size=self.tile_size,
            resize_to=self.model_size if self.host_resize else None,
            fast_decode=fast_decode,
        )
        results: Dict[str, Optional[np.ndarray]] = {}
        if background_skip:
            from .io.tissue import prefilter_tile_paths

            folder_ds.files, skipped = prefilter_tile_paths(folder_ds.files)
            for p in skipped:
                results[p] = None
            if skipped:
                print(f"background prefilter skipped {len(skipped)}/"
                      f"{len(skipped) + len(folder_ds.files)} tiles",
                      flush=True)
            if not folder_ds.files:
                return results
        inflight: "collections.deque" = collections.deque()
        tile_size = self.tile_size

        def drain_one():
            paths, n_valid, (dets, valid), n_cand = inflight.popleft()
            ragged = nms_ops.dense_to_ragged(dets, valid)  # sync point
            self.account_overflow(n_valid, n_cand)
            for path, det in list(zip(paths, ragged))[:n_valid]:
                if det is not None:
                    # non-standard tiles (WSI borders): back to the image's
                    # own pixel space, like the reference's per-image
                    # rescale_boxes (detect.py:129)
                    orig = folder_ds.orig_shapes.get(path)
                    if orig is not None:
                        det = rescale_from_tile_frame(det, tile_size, orig)
                if det is not None and merge_boxes:
                    det = merge_detections(det)
                if det is not None and caa_filter is not None:
                    det = caa_filter(path, det)
                    if det is not None and len(det) == 0:
                        det = None
                results[path] = det

        batch_size = resolve_batch_size(batch_size, len(folder_ds))
        if self.precision.startswith("int8") and self._act_scales is None:
            # int8 lazy calibration over the first ~CALIB_TILES tiles, not
            # just the first batch: 8-tile calibration under-covers the
            # activation range and cost int8_full 2.7 mAP pts on the r4p2
            # gate (amax_c8 0.657 vs amax_c48 0.684 vs bf16 0.675 —
            # tools/int8_calib_study.py, BENCH.md "int8 calibration").
            self._calibrate_from_folder(folder_ds, batch_size)
        for paths, batch, n_valid in folder_ds.iter_batches(batch_size):
            inflight.append((paths, n_valid, self(batch), self._last_ncand))
            if len(inflight) > pipeline_depth:
                drain_one()
        while inflight:
            drain_one()
        return results


__all__ = ["Detector", "resolve_batch_size"]
