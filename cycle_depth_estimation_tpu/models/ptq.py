"""Generic post-training int8 quantization for any model in the framework.

The hand-fused CycleGAN path (models/quantization.py) exploits InstanceNorm
invariance and is the headline serving configuration. This module is the
*breadth* mechanism: it turns ANY flax model built from the framework's
``ops.Conv`` / ``ops.ConvTranspose`` layers into an int8-served inference
function without touching the model code, via flax method interception
(``nn.intercept_methods``). That covers the reference's other inference
surfaces — pix2pix U-Net serving (reference models/networks.py:243-316),
RefineNet-LW depth inference (new_model/my_rf_lw.py:323-457) and the full
new_multi S2D eval path (new_multi/model5.py:376-413) — with one mechanism.

Scheme (same as models/quantization.py v1):
- weights: per-output-channel symmetric int8 (scale = max|w| / 127);
- activations: per-tensor symmetric int8, STATIC scales baked from a
  calibration batch (abs-max + margin);
- conv runs on the int8 MXU path (``preferred_element_type=int32``); the
  dequantize multiply and bias stay float and XLA fuses them into the
  surrounding elementwise chain (for conv→BatchNorm sites the multiply
  folds into BN's affine constants at compile time — BN at eval is a
  per-channel affine, so the fusion is exact and free).
- ``ConvTranspose`` sites stay in the float dtype by default: the int8
  lhs-dilated form measured ~2× slower on v5e (see
  models/quantization.py ``fused_int8_apply`` up_mode docstring); opt in
  per-site via ``predicate``.

Calibration runs UNJITTED (eager) so observed abs-maxes are concrete —
run it on CPU/host for big models; serving (`int8_apply`) is jittable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from ..ops import Conv, ConvTranspose, reflect_pad
from ..ops.layers import DIMENSION_NUMBERS, _pad2, _pair
from .quantization import quantize_conv_params


PathKey = str


def _key(module: nn.Module) -> PathKey:
    return "/".join(module.path)


def default_predicate(path: PathKey, module: nn.Module) -> bool:
    """Quantize every Conv; keep ConvTranspose float (v5e measurement)."""
    return isinstance(module, Conv)


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def calibrate_model(
    apply_fn: Callable[..., Any],
    *args: Any,
    predicate: Callable[[PathKey, nn.Module], bool] = default_predicate,
    margin: float = 1.0,
    **kwargs: Any,
) -> Dict[PathKey, Dict[str, Any]]:
    """Run ``apply_fn(*args, **kwargs)`` eagerly, recording every selected
    conv site's weights and observed input abs-max.

    Returns the int8 site tree: ``{path: {kernel_q, scale, act_scale[, bias]}}``
    (arrays only — module geometry is re-read from the live module at serving
    time, so the tree is a plain jittable pytree).
    """
    sites: Dict[PathKey, Dict[str, Any]] = {}

    def interceptor(next_fun, a, kw, ctx):
        m = ctx.module
        if (isinstance(m, (Conv, ConvTranspose))
                and ctx.method_name == "__call__"):
            key = _key(m)
            if predicate(key, m):
                params = m.variables["params"]
                # same per-out-channel symmetric scheme as the fused
                # generator path (review dedupe: was re-implemented inline)
                amax = float(np.max(np.abs(np.asarray(a[0], np.float32))))
                entry = dict(
                    quantize_conv_params(params),
                    act_scale=np.float32(max(amax * margin / 127.0, 1e-12)))
                if key in sites:  # shared module applied twice: widen scale
                    entry["act_scale"] = np.float32(
                        max(entry["act_scale"], sites[key]["act_scale"]))
                sites[key] = entry
        return next_fun(*a, **kw)

    with nn.intercept_methods(interceptor):
        apply_fn(*args, **kwargs)
    return sites


# ---------------------------------------------------------------------------
# Serving
# ---------------------------------------------------------------------------


def _int8_conv(m: Conv, x: jax.Array, q: Dict[str, jax.Array]) -> jax.Array:
    out_dtype = m.dtype or x.dtype
    kh, kw = _pair(m.kernel_size)
    sh, sw = _pair(m.stride)
    dh, dw = _pair(m.dilation)
    xf = x.astype(jnp.float32) / q["act_scale"]
    xq = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    if m.padding_mode == "reflect":
        xq = reflect_pad(xq, m.padding)
        pad: Any = ((0, 0), (0, 0))
    else:
        # single source of torch padding-form semantics (review dedupe)
        pad = _pad2(m.padding)
    y = lax.conv_general_dilated(
        xq, q["kernel_q"], (sh, sw), pad, rhs_dilation=(dh, dw),
        dimension_numbers=DIMENSION_NUMBERS,
        feature_group_count=m.feature_group_count,
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (q["act_scale"] * q["scale"])
    if "bias" in q:
        out = out + q["bias"]
    return out.astype(out_dtype)


def _int8_conv_transpose(m: ConvTranspose, x: jax.Array,
                         q: Dict[str, jax.Array]) -> jax.Array:
    out_dtype = m.dtype or x.dtype
    kh, kw = _pair(m.kernel_size)
    sh, sw = _pair(m.stride)
    ph, pw = _pair(m.padding)
    oph, opw = _pair(m.output_padding)
    xf = x.astype(jnp.float32) / q["act_scale"]
    xq = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
    pad = ((kh - 1 - ph, kh - 1 - ph + oph), (kw - 1 - pw, kw - 1 - pw + opw))
    y = lax.conv_general_dilated(
        xq, q["kernel_q"], (1, 1), pad, lhs_dilation=(sh, sw),
        dimension_numbers=DIMENSION_NUMBERS,
        preferred_element_type=jnp.int32)
    out = y.astype(jnp.float32) * (q["act_scale"] * q["scale"])
    if "bias" in q:
        out = out + q["bias"]
    return out.astype(out_dtype)


def int8_interceptor(sites: Dict[PathKey, Dict[str, jax.Array]]):
    """Flax interceptor replacing each calibrated conv with its int8 form."""

    def interceptor(next_fun, a, kw, ctx):
        m = ctx.module
        if (isinstance(m, (Conv, ConvTranspose))
                and ctx.method_name == "__call__"):
            q = sites.get(_key(m))
            if q is not None:
                if isinstance(m, ConvTranspose):
                    return _int8_conv_transpose(m, a[0], q)
                return _int8_conv(m, a[0], q)
        return next_fun(*a, **kw)

    return interceptor


def int8_apply(apply_fn: Callable[..., Any],
               sites: Dict[PathKey, Dict[str, jax.Array]],
               *args: Any, **kwargs: Any) -> Any:
    """Run ``apply_fn`` with calibrated conv sites served int8. Jittable:
    pass ``sites`` through as a pytree argument of the jitted function so the
    weights aren't baked into the program as constants."""
    with nn.intercept_methods(int8_interceptor(sites)):
        return apply_fn(*args, **kwargs)


def quantize_for_serving(
    model: nn.Module,
    variables: Dict[str, Any],
    calib_args: Tuple[Any, ...],
    *,
    predicate: Callable[[PathKey, nn.Module], bool] = default_predicate,
    margin: float = 1.0,
    calib_kwargs: Optional[Dict[str, Any]] = None,
) -> Tuple[Dict[PathKey, Dict[str, Any]], Callable[..., Any]]:
    """One-call PTQ: calibrate on ``calib_args`` and return
    ``(sites, serve_fn)`` where ``serve_fn(variables, sites, *args, **kw)``
    is the jittable int8 inference function (variables still supply the
    norms and any non-quantized convs).

    >>> sites, serve = quantize_for_serving(g, vs, (calib_x,))
    >>> fast = jax.jit(serve)
    >>> y = fast(vs_device, jax.device_put(sites), x)
    """
    calib_kwargs = calib_kwargs or {}
    sites = calibrate_model(
        lambda *a, **kw: model.apply(variables, *a, **kw),
        *calib_args, predicate=predicate, margin=margin, **calib_kwargs)

    def serve_fn(variables_, sites_, *args, **kw):
        return int8_apply(
            lambda *a, **k: model.apply(variables_, *a, **k), sites_,
            *args, **kw)

    return sites, serve_fn
