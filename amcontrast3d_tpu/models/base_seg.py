"""Segmentation model wrappers (↔ openpoints/models/segmentation/base_seg.py).

* ``BaseSeg``                — vanilla PointNeXt: logits only.
* ``BaseSeg_AMContrast3D``   — also returns the per-stage embeddings the
  adaptive-margin contrastive loss consumes (the reference's
  ``stageACE_list`` of flattened (p, f, offset) dicts becomes a dict of
  dense per-stage tensors — a pure layout change, base_seg.py:97-126).
* ``BaseSeg_M_AMContrast3D`` — ++ variant: APM ambiguity branch per encoder
  stage + masked refinement inside the decoder (base_seg.py:17-94).

Stage dict layout (index s ↔ encoder stage s, full resolution first):
  ``p``      : tuple of 4 stage positions (B, N_s, 3), N_s = N/4^s
  ``f_down`` : encoder features per stage
  ``f_up``   : decoder features per stage (refreshed like
               ``stageACE_list['up'][i]['f_out']``, pointnext_AA.py:508-522)
  ``ambiguity`` (MM only): predicted a per stage (B, N_s)
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from .build import MODELS, make_module
from .pointnext import PointNextDecoder, PointNextEncoder, SegHead


def _build_encoder(encoder_args, bn_axis_name, dtype):
    ea = dict(encoder_args)
    name = ea.pop("NAME", "PointNextEncoder")
    cls = MODELS.get(name) or PointNextEncoder
    return make_module(cls, ea, bn_axis_name=bn_axis_name, dtype=dtype)


def _build_decoder(encoder_args, decoder_args, encoder, bn_axis_name, dtype,
                   **extra):
    """Merge encoder args into decoder args (base_seg.py:102-106)."""
    merged = dict(encoder_args)
    merged.update(dict(decoder_args))
    merged.pop("NAME", None)
    name = dict(decoder_args).get("NAME", "PointNextDecoder")
    # the AMContrast3D decoder aliases resolve to PointNextDecoder
    cls = PointNextDecoder if name.startswith("PointNextDecoder") \
        else (MODELS.get(name) or PointNextDecoder)
    merged["encoder_channel_list"] = encoder.channel_list
    merged["in_channels_input"] = dict(encoder_args).get("in_channels", 3)
    merged.update(extra)
    return make_module(cls, merged, bn_axis_name=bn_axis_name, dtype=dtype)


def _build_head(cls_args, decoder, encoder, bn_axis_name, dtype):
    ca = dict(cls_args)
    ca.pop("NAME", None)
    if getattr(decoder, "out_channels", None) is not None:
        ca["in_channels"] = decoder.out_channels
    elif getattr(encoder, "out_channels", None) is not None:
        ca["in_channels"] = encoder.out_channels
    return make_module(SegHead, ca, bn_axis_name=bn_axis_name, dtype=dtype)


@MODELS.register_module()
class BaseSeg(nn.Module):
    """↔ BaseSeg (base_seg.py:130-166)."""
    encoder_args: Any
    decoder_args: Any = None
    cls_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = _build_encoder(self.encoder_args, self.bn_axis_name, self.dtype)
        self.decoder = (_build_decoder(self.encoder_args, self.decoder_args,
                                       self.encoder, self.bn_axis_name, self.dtype)
                        if self.decoder_args is not None else None)
        self.head = (_build_head(self.cls_args, self.decoder, self.encoder,
                                 self.bn_axis_name, self.dtype)
                     if self.cls_args is not None else None)

    def __call__(self, pos, features, training: bool = False):
        p, f = self.encoder(pos, features, training=training)
        if self.decoder is not None:
            f, _, _ = self.decoder(p, f, training=training)
        else:
            f = f[-1]
        if self.head is not None:
            f = self.head(f, training=training)
        return f


@MODELS.register_module()
class BaseSeg_AMContrast3D(nn.Module):
    """↔ BaseSeg_AMContrast3D (base_seg.py:97-126): returns (logits, stages)."""
    encoder_args: Any
    decoder_args: Any = None
    cls_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = _build_encoder(self.encoder_args, self.bn_axis_name, self.dtype)
        self.decoder = _build_decoder(self.encoder_args, self.decoder_args,
                                      self.encoder, self.bn_axis_name, self.dtype)
        self.head = _build_head(self.cls_args, self.decoder, self.encoder,
                                self.bn_axis_name, self.dtype)

    def __call__(self, pos, features, training: bool = False):
        p, f = self.encoder(pos, features, training=training)
        f_out, up_features, _ = self.decoder(p, f, training=training)
        logits = self.head(f_out, training=training)
        n_stages = len(up_features)
        stages = {
            "p": tuple(p[1:1 + n_stages]),
            "f_down": tuple(f[1:1 + n_stages]),
            "f_up": tuple(up_features),
        }
        return logits, stages


@MODELS.register_module()
class BaseSeg_M_AMContrast3D(nn.Module):
    """↔ BaseSeg_M_AMContrast3D (base_seg.py:17-94): APM branch + refinement.

    ``ambiguity_source``/``source_mode`` mirror ``ambiguity_args.source``:
    'APM' uses the predicted ambiguity for refinement (inference-capable);
    'AEF' (train only) uses ground-truth ambiguity — computed in the loss and
    passed in as ``aef_ambiguity``.
    """
    encoder_args: Any
    decoder_args: Any = None
    cls_args: Any = None
    AEF_args: Any = None
    APM_args: Any = None
    bn_axis_name: Optional[str] = None
    dtype: Any = jnp.float32

    def setup(self):
        apm = dict(self.APM_args or {})
        self.apm_name = apm.get("NAME", "APM_pf_ConCate")
        self.linear_mapping = bool(apm.get("linear_mapping", False))
        self.refine_attention = bool(apm.get("cross_attention", False))
        self.encoder = _build_encoder(self.encoder_args, self.bn_axis_name, self.dtype)
        self.decoder = _build_decoder(
            self.encoder_args, self.decoder_args, self.encoder,
            self.bn_axis_name, self.dtype,
            refine=True,
            refine_mapping=self.linear_mapping,
            refine_attention=self.refine_attention,
            nsample_k=int(apm.get("nsample_k", 12)),
            fusion=apm.get("fusion", "MIN"),
            threshold=float(apm.get("threshold", 0.7)),
            threshold_max=float(apm.get("threshold_max", 1.0)),
            gamma=float(apm.get("gamma", 0.5)),
        )
        self.head = _build_head(self.cls_args, self.decoder, self.encoder,
                                self.bn_axis_name, self.dtype)
        apm_cls = MODELS.get(self.apm_name)
        if apm_cls is None:
            raise KeyError(f"APM {self.apm_name} not registered")
        self.APM = make_module(apm_cls, apm, bn_axis_name=self.bn_axis_name,
                               dtype=self.dtype)

    def __call__(self, pos, features, training: bool = False,
                 target=None, aef_ambiguity=None):
        p, f = self.encoder(pos, features, training=training)
        n_stages = self.decoder.decoder_stages

        # APM branch over encoder stages 1…n (base_seg.py:64-89)
        a_list, a_map_list = [], []
        for i in range(1, 1 + n_stages):
            out = self.APM(p[i], f[i], stage=i - 1, training=training)
            if self.linear_mapping:
                a, a_map = out
                a_map_list.append(a_map)
            else:
                a = out
            a_list.append(a[..., 0])  # (B, N_s)

        # ambiguity source for refinement (pointnext_MM.py:522-534):
        # 'APM' = predicted (inference-capable, default); 'AEF' = ground
        # truth from labels (train only)
        aef_args = dict(self.AEF_args or {})
        if (aef_ambiguity is None and target is not None
                and aef_args.get("source") == "AEF"):
            from ..loss.contrast import ambiguity_head
            up0 = [(p[i], f[i]) for i in range(1, 1 + n_stages)]
            aef_ambiguity = ambiguity_head(
                up0, target, int(dict(self.cls_args)["num_classes"]),
                dict(self.cls_args).get("ignore_index"), aef_args)

        refine_a = a_list if aef_ambiguity is None else aef_ambiguity
        f_out, up_features, refine_rate = self.decoder(
            p, f, a_list=refine_a,
            a_map_list=a_map_list if self.linear_mapping else None,
            training=training)
        logits = self.head(f_out, training=training)
        stages = {
            "p": tuple(p[1:1 + n_stages]),
            "f_down": tuple(f[1:1 + n_stages]),
            "f_up": tuple(up_features),
            "ambiguity": tuple(a_list),
        }
        return logits, stages, refine_rate


# registry aliases for the reference encoder/decoder names
MODELS.register_module(name=["PointNextEncoder", "PointNextEncoder_AMContrast3D",
                             "PointNextEncoder_M_AMContrast3D"],
                       module=PointNextEncoder)
MODELS.register_module(name=["PointNextDecoder", "PointNextDecoder_AMContrast3D",
                             "PointNextDecoder_M_AMContrast3D"],
                       module=PointNextDecoder)
MODELS.register_module(module=SegHead)
