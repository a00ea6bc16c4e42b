"""Numeric parity of the GroundingDINO flax port against the official torch
implementation (transformers.GroundingDino*, the HF port of
IDEA-Research/GroundingDINO whose checkpoint conversion is verified against
the swinT_OGC release the reference pipeline downloads —
cubercnn/data/generate_ground_segmentations.py:129-206).

Strategy per VERDICT: random-init the official-architecture torch modules,
remap their state dicts to the official checkpoint naming that
utils/convert_weights.convert_groundingdino expects, convert, and require
flax outputs to match torch — component by component (Swin, BERT,
multi-scale deformable attention, fusion, enhancer/decoder layers), then
end-to-end.
"""
from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from threedod.utils.convert_weights import convert_groundingdino


# ---------------------------------------------------------------------------
# HF state dict -> official groundingdino (swinT_OGC) naming
# ---------------------------------------------------------------------------

def _cat_qkv(sd, q, k, v):
    return (
        np.concatenate([sd[q + ".weight"], sd[k + ".weight"], sd[v + ".weight"]], 0),
        np.concatenate([sd[q + ".bias"], sd[k + ".bias"], sd[v + ".bias"]], 0),
    )


def hf_swin_to_official(sd, depths, prefix="backbone.conv_encoder.model.", out="backbone.0."):
    """transformers SwinBackbone -> official Swin naming (fused qkv)."""
    o = {}
    o[out + "patch_embed.proj.weight"] = sd[prefix + "embeddings.patch_embeddings.projection.weight"]
    o[out + "patch_embed.proj.bias"] = sd[prefix + "embeddings.patch_embeddings.projection.bias"]
    o[out + "patch_embed.norm.weight"] = sd[prefix + "embeddings.norm.weight"]
    o[out + "patch_embed.norm.bias"] = sd[prefix + "embeddings.norm.bias"]
    for s, depth in enumerate(depths):
        for b in range(depth):
            hf = f"{prefix}encoder.layers.{s}.blocks.{b}."
            of = f"{out}layers.{s}.blocks.{b}."
            w, bias = _cat_qkv(
                sd, hf + "attention.self.query", hf + "attention.self.key", hf + "attention.self.value"
            )
            o[of + "attn.qkv.weight"] = w
            o[of + "attn.qkv.bias"] = bias
            o[of + "attn.proj.weight"] = sd[hf + "attention.output.dense.weight"]
            o[of + "attn.proj.bias"] = sd[hf + "attention.output.dense.bias"]
            o[of + "attn.relative_position_bias_table"] = sd[
                hf + "attention.self.relative_position_bias_table"
            ]
            o[of + "norm1.weight"] = sd[hf + "layernorm_before.weight"]
            o[of + "norm1.bias"] = sd[hf + "layernorm_before.bias"]
            o[of + "norm2.weight"] = sd[hf + "layernorm_after.weight"]
            o[of + "norm2.bias"] = sd[hf + "layernorm_after.bias"]
            o[of + "mlp.fc1.weight"] = sd[hf + "intermediate.dense.weight"]
            o[of + "mlp.fc1.bias"] = sd[hf + "intermediate.dense.bias"]
            o[of + "mlp.fc2.weight"] = sd[hf + "output.dense.weight"]
            o[of + "mlp.fc2.bias"] = sd[hf + "output.dense.bias"]
        if s != len(depths) - 1:
            hf = f"{prefix}encoder.layers.{s}.downsample."
            of = f"{out}layers.{s}.downsample."
            o[of + "norm.weight"] = sd[hf + "norm.weight"]
            o[of + "norm.bias"] = sd[hf + "norm.bias"]
            o[of + "reduction.weight"] = sd[hf + "reduction.weight"]
    for i, stage in enumerate(["stage2", "stage3", "stage4"]):
        key = f"{prefix}hidden_states_norms.{stage}.weight"
        if key in sd:
            o[f"{out}norm{i + 1}.weight"] = sd[key]
            o[f"{out}norm{i + 1}.bias"] = sd[f"{prefix}hidden_states_norms.{stage}.bias"]
    return o


class TestSwinParity:
    def test_swin_backbone(self):
        from transformers import SwinBackbone, SwinConfig

        from threedod.models.gdino.swin import SwinT

        torch.manual_seed(0)
        depths = (2, 2, 2, 2)
        cfg = SwinConfig(
            embed_dim=96,
            depths=list(depths),
            num_heads=[3, 6, 12, 24],
            window_size=7,
            out_features=["stage2", "stage3", "stage4"],
            hidden_act="gelu",
        )
        hf = SwinBackbone(cfg)
        hf.eval()

        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        official = hf_swin_to_official(sd, depths, prefix="", out="backbone.0.")

        # rebuild the swin param tree with the production converter's helpers
        from threedod.utils import convert_weights as cw

        bb = {
            "patch_embed": cw.conv(official, "backbone.0.patch_embed.proj"),
            "patch_norm": cw.layernorm(official, "backbone.0.patch_embed.norm"),
        }
        for s, depth in enumerate(depths):
            for b in range(depth):
                t = f"backbone.0.layers.{s}.blocks.{b}"
                bb[f"stage{s}_block{b}"] = {
                    "norm1": cw.layernorm(official, f"{t}.norm1"),
                    "attn": {
                        "qkv": cw.linear(official, f"{t}.attn.qkv"),
                        "proj": cw.linear(official, f"{t}.attn.proj"),
                        "relative_position_bias_table": np.asarray(
                            official[f"{t}.attn.relative_position_bias_table"]
                        ),
                    },
                    "norm2": cw.layernorm(official, f"{t}.norm2"),
                    "mlp_fc1": cw.linear(official, f"{t}.mlp.fc1"),
                    "mlp_fc2": cw.linear(official, f"{t}.mlp.fc2"),
                }
            if s != len(depths) - 1:
                t = f"backbone.0.layers.{s}.downsample"
                bb[f"downsample{s}"] = {
                    "norm": cw.layernorm(official, f"{t}.norm"),
                    "reduction": {"kernel": np.asarray(official[f"{t}.reduction.weight"]).T},
                }
            if f"backbone.0.norm{s}.weight" in official:
                bb[f"out_norm{s}"] = cw.layernorm(official, f"backbone.0.norm{s}")

        # all stage grids must exceed the 7-window: HF's classification-Swin
        # shrinks window/shift at tiny grids, detection-Swin (and real
        # gdino inputs, ~800px) never enters that regime
        x = np.random.RandomState(0).randn(1, 3, 256, 288).astype(np.float32)
        with torch.no_grad():
            t_out = hf(torch.from_numpy(x)).feature_maps  # stages 2..4, NCHW

        swin = SwinT(depths=depths)
        j_out = swin.apply({"params": bb}, jnp.asarray(x.transpose(0, 2, 3, 1)))
        for i, k in enumerate(["p3", "p4", "p5"]):
            got = np.asarray(j_out[k])
            want = t_out[i].numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(got, want, atol=1e-3, rtol=2e-3, err_msg=k)


class TestBertParity:
    def test_bert_padding_mask(self):
        from transformers import BertConfig, BertModel

        from threedod.models.gdino.bert import BertEncoder
        from threedod.utils import convert_weights as cw

        torch.manual_seed(1)
        cfg = BertConfig(num_hidden_layers=3)
        hf = BertModel(cfg, add_pooling_layer=False)
        hf.eval()
        sd = {f"bert.{k}": v.detach().numpy() for k, v in hf.state_dict().items()}

        bert = {
            "word_embeddings": {"embedding": sd["bert.embeddings.word_embeddings.weight"]},
            "position_embeddings": {"embedding": sd["bert.embeddings.position_embeddings.weight"]},
            "token_type_embeddings": {"embedding": sd["bert.embeddings.token_type_embeddings.weight"]},
            "embeddings_norm": cw.layernorm(sd, "bert.embeddings.LayerNorm"),
        }
        for i in range(3):
            t = f"bert.encoder.layer.{i}"
            bert[f"layer{i}"] = {
                "q": cw.linear(sd, f"{t}.attention.self.query"),
                "k": cw.linear(sd, f"{t}.attention.self.key"),
                "v": cw.linear(sd, f"{t}.attention.self.value"),
                "attn_out": cw.linear(sd, f"{t}.attention.output.dense"),
                "attn_norm": cw.layernorm(sd, f"{t}.attention.output.LayerNorm"),
                "ffn_in": cw.linear(sd, f"{t}.intermediate.dense"),
                "ffn_out": cw.linear(sd, f"{t}.output.dense"),
                "ffn_norm": cw.layernorm(sd, f"{t}.output.LayerNorm"),
            }

        rng = np.random.RandomState(0)
        ids = rng.randint(0, 30522, (2, 12)).astype(np.int32)
        mask = np.ones((2, 12), bool)
        mask[1, 8:] = False
        with torch.no_grad():
            t_out = hf(
                input_ids=torch.from_numpy(ids.astype(np.int64)),
                attention_mask=torch.from_numpy(mask.astype(np.int64)),
            ).last_hidden_state.numpy()
        enc = BertEncoder(layers=3)
        j_out = enc.apply({"params": bert}, jnp.asarray(ids), jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(j_out)[mask], t_out[mask], atol=5e-4, rtol=2e-3
        )


class TestDeformableParity:
    def test_ms_deform_attn(self):
        from transformers import GroundingDinoConfig
        from transformers.models.grounding_dino.modeling_grounding_dino import (
            GroundingDinoMultiscaleDeformableAttention,
        )

        from threedod.models.gdino.deformable import MSDeformAttn
        from threedod.utils import convert_weights as cw

        torch.manual_seed(2)
        cfg = GroundingDinoConfig()
        attn = GroundingDinoMultiscaleDeformableAttention(cfg, num_heads=8, n_points=4)
        attn.eval()
        sd = {k: v.detach().numpy() for k, v in attn.state_dict().items()}
        params = {
            "sampling_offsets": cw.linear(sd, "sampling_offsets"),
            "attention_weights": cw.linear(sd, "attention_weights"),
            "value_proj": cw.linear(sd, "value_proj"),
            "output_proj": cw.linear(sd, "output_proj"),
        }

        rng = np.random.RandomState(3)
        shapes = [(8, 12), (4, 6), (2, 3), (1, 2)]
        S = sum(h * w for h, w in shapes)
        B, Lq = 2, 7
        query = rng.randn(B, Lq, 256).astype(np.float32)
        value = rng.randn(B, S, 256).astype(np.float32)
        refs = rng.uniform(0.1, 0.9, (B, Lq, 4, 2)).astype(np.float32)

        with torch.no_grad():
            t_out = attn(
                hidden_states=torch.from_numpy(query),
                encoder_hidden_states=torch.from_numpy(value),
                reference_points=torch.from_numpy(refs),
                spatial_shapes=torch.tensor(shapes, dtype=torch.long),
                spatial_shapes_list=[tuple(s) for s in shapes],
                level_start_index=torch.tensor(
                    np.cumsum([0] + [h * w for h, w in shapes])[:-1], dtype=torch.long
                ),
            )[0].numpy()

        m = MSDeformAttn(256, 8, 4, 4)
        j_out = m.apply(
            {"params": params},
            jnp.asarray(query),
            jnp.asarray(refs),
            jnp.asarray(value),
            shapes,
        )
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=5e-5, rtol=1e-3)

    def test_ms_deform_attn_box_refs(self):
        """4-coord reference boxes (decoder path): loc = xy + off/P * wh * 0.5."""
        from transformers import GroundingDinoConfig
        from transformers.models.grounding_dino.modeling_grounding_dino import (
            GroundingDinoMultiscaleDeformableAttention,
        )

        from threedod.models.gdino.deformable import MSDeformAttn
        from threedod.utils import convert_weights as cw

        torch.manual_seed(4)
        cfg = GroundingDinoConfig()
        attn = GroundingDinoMultiscaleDeformableAttention(cfg, num_heads=8, n_points=4)
        attn.eval()
        sd = {k: v.detach().numpy() for k, v in attn.state_dict().items()}
        params = {
            "sampling_offsets": cw.linear(sd, "sampling_offsets"),
            "attention_weights": cw.linear(sd, "attention_weights"),
            "value_proj": cw.linear(sd, "value_proj"),
            "output_proj": cw.linear(sd, "output_proj"),
        }
        rng = np.random.RandomState(5)
        shapes = [(8, 12), (4, 6), (2, 3), (1, 2)]
        S = sum(h * w for h, w in shapes)
        B, Lq = 1, 5
        query = rng.randn(B, Lq, 256).astype(np.float32)
        value = rng.randn(B, S, 256).astype(np.float32)
        boxes = np.concatenate(
            [rng.uniform(0.2, 0.8, (B, Lq, 4, 2)), rng.uniform(0.05, 0.3, (B, Lq, 4, 2))],
            axis=-1,
        ).astype(np.float32)
        with torch.no_grad():
            t_out = attn(
                hidden_states=torch.from_numpy(query),
                encoder_hidden_states=torch.from_numpy(value),
                reference_points=torch.from_numpy(boxes),
                spatial_shapes=torch.tensor(shapes, dtype=torch.long),
                spatial_shapes_list=[tuple(s) for s in shapes],
                level_start_index=torch.tensor(
                    np.cumsum([0] + [h * w for h, w in shapes])[:-1], dtype=torch.long
                ),
            )[0].numpy()
        m = MSDeformAttn(256, 8, 4, 4)
        j_out = m.apply(
            {"params": params}, jnp.asarray(query), jnp.asarray(boxes), jnp.asarray(value), shapes
        )
        np.testing.assert_allclose(np.asarray(j_out), t_out, atol=5e-5, rtol=1e-3)


class TestFusionParity:
    def test_bi_attention_block(self):
        from transformers import GroundingDinoConfig
        from transformers.models.grounding_dino.modeling_grounding_dino import (
            GroundingDinoFusionLayer,
        )

        from threedod.models.gdino.model import BiAttentionBlock
        from threedod.utils import convert_weights as cw

        torch.manual_seed(6)
        cfg = GroundingDinoConfig()
        fu = GroundingDinoFusionLayer(cfg)
        fu.eval()
        sd = {k: v.detach().numpy() for k, v in fu.state_dict().items()}
        params = {
            "layer_norm_v": cw.layernorm(sd, "layer_norm_vision"),
            "layer_norm_l": cw.layernorm(sd, "layer_norm_text"),
            "v_proj": cw.linear(sd, "attn.vision_proj"),
            "l_proj": cw.linear(sd, "attn.text_proj"),
            "values_v_proj": cw.linear(sd, "attn.values_vision_proj"),
            "values_l_proj": cw.linear(sd, "attn.values_text_proj"),
            "out_v_proj": cw.linear(sd, "attn.out_vision_proj"),
            "out_l_proj": cw.linear(sd, "attn.out_text_proj"),
            "gamma_v": sd["vision_param"],
            "gamma_l": sd["text_param"],
        }
        rng = np.random.RandomState(7)
        B, Lv, Lt = 2, 30, 9
        vis = rng.randn(B, Lv, 256).astype(np.float32)
        txt = rng.randn(B, Lt, 256).astype(np.float32)
        tmask = np.ones((B, Lt), bool)
        tmask[1, 6:] = False
        with torch.no_grad():
            (v_out, _), (t_out, _) = fu(
                vision_features=torch.from_numpy(vis),
                text_features=torch.from_numpy(txt),
                attention_mask_vision=None,
                # HF semantics: True = masked-out (padding)
                attention_mask_text=torch.from_numpy(~tmask),
            )
        blk = BiAttentionBlock()
        jv, jt = blk.apply(
            {"params": params}, jnp.asarray(vis), jnp.asarray(txt), jnp.asarray(tmask)
        )
        np.testing.assert_allclose(np.asarray(jv), v_out.numpy(), atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(
            np.asarray(jt)[tmask], t_out.numpy()[tmask], atol=5e-5, rtol=1e-3
        )


def hf_gdino_to_official(sd, depths=(2, 2, 2, 2), enc_layers=2, dec_layers=2, bert_layers=2):
    """transformers.GroundingDinoForObjectDetection state dict (numpy) ->
    official swinT_OGC checkpoint naming for convert_groundingdino."""
    o = hf_swin_to_official(sd, depths, prefix="model.backbone.conv_encoder.model.")

    for k, v in sd.items():
        if k.startswith("model.text_backbone."):
            o[k.replace("model.text_backbone.", "bert.")] = v
    o["feat_map.weight"] = sd["model.text_projection.weight"]
    o["feat_map.bias"] = sd["model.text_projection.bias"]
    for i in range(4):
        for wb in ("weight", "bias"):
            o[f"input_proj.{i}.0.{wb}"] = sd[f"model.input_proj_vision.{i}.0.{wb}"]
            o[f"input_proj.{i}.1.{wb}"] = sd[f"model.input_proj_vision.{i}.1.{wb}"]
    o["transformer.level_embed"] = sd["model.level_embed"]

    def packed(dst, src):
        w, b = _cat_qkv(sd, src + ".query", src + ".key", src + ".value")
        o[dst + ".in_proj_weight"] = w
        o[dst + ".in_proj_bias"] = b
        o[dst + ".out_proj.weight"] = sd[src + ".out_proj.weight"]
        o[dst + ".out_proj.bias"] = sd[src + ".out_proj.bias"]

    for i in range(enc_layers):
        hf = f"model.encoder.layers.{i}."
        fu = f"transformer.encoder.fusion_layers.{i}."
        for a, b in [
            ("layer_norm_v", "fusion_layer.layer_norm_vision"),
            ("layer_norm_l", "fusion_layer.layer_norm_text"),
            ("attn.v_proj", "fusion_layer.attn.vision_proj"),
            ("attn.l_proj", "fusion_layer.attn.text_proj"),
            ("attn.values_v_proj", "fusion_layer.attn.values_vision_proj"),
            ("attn.values_l_proj", "fusion_layer.attn.values_text_proj"),
            ("attn.out_v_proj", "fusion_layer.attn.out_vision_proj"),
            ("attn.out_l_proj", "fusion_layer.attn.out_text_proj"),
        ]:
            for wb in ("weight", "bias"):
                o[fu + a + "." + wb] = sd[hf + b + "." + wb]
        o[fu + "gamma_v"] = sd[hf + "fusion_layer.vision_param"]
        o[fu + "gamma_l"] = sd[hf + "fusion_layer.text_param"]

        te = f"transformer.encoder.text_layers.{i}."
        packed(te + "self_attn", hf + "text_enhancer_layer.self_attn")
        for a, b in [
            ("norm1", "text_enhancer_layer.layer_norm_before"),
            ("norm2", "text_enhancer_layer.layer_norm_after"),
            ("linear1", "text_enhancer_layer.fc1"),
            ("linear2", "text_enhancer_layer.fc2"),
        ]:
            for wb in ("weight", "bias"):
                o[te + a + "." + wb] = sd[hf + b + "." + wb]

        de = f"transformer.encoder.layers.{i}."
        for a, b in [
            ("self_attn.sampling_offsets", "deformable_layer.self_attn.sampling_offsets"),
            ("self_attn.attention_weights", "deformable_layer.self_attn.attention_weights"),
            ("self_attn.value_proj", "deformable_layer.self_attn.value_proj"),
            ("self_attn.output_proj", "deformable_layer.self_attn.output_proj"),
            ("norm1", "deformable_layer.self_attn_layer_norm"),
            ("linear1", "deformable_layer.fc1"),
            ("linear2", "deformable_layer.fc2"),
            ("norm2", "deformable_layer.final_layer_norm"),
        ]:
            for wb in ("weight", "bias"):
                o[de + a + "." + wb] = sd[hf + b + "." + wb]

    for wb in ("weight", "bias"):
        o[f"transformer.enc_output.{wb}"] = sd[f"model.enc_output.{wb}"]
        o[f"transformer.enc_output_norm.{wb}"] = sd[f"model.enc_output_norm.{wb}"]
        for j in range(3):
            o[f"transformer.enc_out_bbox_embed.layers.{j}.{wb}"] = sd[
                f"model.encoder_output_bbox_embed.layers.{j}.{wb}"
            ]
        for j in range(2):
            o[f"transformer.decoder.ref_point_head.layers.{j}.{wb}"] = sd[
                f"model.decoder.reference_points_head.layers.{j}.{wb}"
            ]
        o[f"transformer.decoder.norm.{wb}"] = sd[f"model.decoder.layer_norm.{wb}"]
    o["transformer.tgt_embed.weight"] = sd["model.query_position_embeddings.weight"]

    for i in range(dec_layers):
        hf = f"model.decoder.layers.{i}."
        of = f"transformer.decoder.layers.{i}."
        packed(of + "self_attn", hf + "self_attn")
        packed(of + "ca_text", hf + "encoder_attn_text")
        for a, b in [
            ("norm2", "self_attn_layer_norm"),           # post self-attn
            ("catext_norm", "encoder_attn_text_layer_norm"),
            ("cross_attn.sampling_offsets", "encoder_attn.sampling_offsets"),
            ("cross_attn.attention_weights", "encoder_attn.attention_weights"),
            ("cross_attn.value_proj", "encoder_attn.value_proj"),
            ("cross_attn.output_proj", "encoder_attn.output_proj"),
            ("norm1", "encoder_attn_layer_norm"),        # post deformable
            ("linear1", "fc1"),
            ("linear2", "fc2"),
            ("norm3", "final_layer_norm"),
        ]:
            for wb in ("weight", "bias"):
                o[of + a + "." + wb] = sd[hf + b + "." + wb]
        for j in range(3):
            for wb in ("weight", "bias"):
                o[f"bbox_embed.{i}.layers.{j}.{wb}"] = sd[f"bbox_embed.{i}.layers.{j}.{wb}"]
    return o


class TestGroundingDinoEndToEnd:
    def test_full_model_parity(self):
        from transformers import GroundingDinoConfig, GroundingDinoForObjectDetection

        from threedod.models.gdino.model import GroundingDINO, generate_text_masks

        torch.manual_seed(11)
        depths, E, D, BL, Q = (2, 2, 2, 2), 2, 2, 2, 20
        cfg = GroundingDinoConfig()
        cfg.encoder_layers = E
        cfg.decoder_layers = D
        cfg.text_config.num_hidden_layers = BL
        cfg.num_queries = Q
        cfg.backbone_config.depths = list(depths)
        hf = GroundingDinoForObjectDetection(cfg)
        hf.eval()

        sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
        official = hf_gdino_to_official(sd, depths, E, D, BL)
        params = convert_groundingdino(official, depths=depths, enc_layers=E, dec_layers=D, bert_layers=BL)

        rng = np.random.RandomState(12)
        x = rng.randn(1, 3, 256, 288).astype(np.float32)
        # "[CLS] <word> <word> . <word> . [SEP]" — two phrases
        ids = np.array([[101, 2598, 3899, 1012, 4937, 1012, 102]], np.int64)
        mask = np.ones_like(ids)

        # (note: HF's text-enhancer layer double-inverts its mask — the
        # call-site `~` feeds a converter that expects True=masked — but the
        # full model pre-inverts text_self_attention_masks before the
        # encoder, so the two inversions cancel and the official phrase-
        # local semantics hold end-to-end.)
        with torch.no_grad():
            t_out = hf(
                pixel_values=torch.from_numpy(x),
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
            )
        Lt = ids.shape[1]
        t_logits = t_out.logits.numpy()[0, :, :Lt]  # HF pads text dim to 256
        t_boxes = t_out.pred_boxes.numpy()[0]

        self_mask, pos_ids = generate_text_masks(ids)
        model = GroundingDINO(
            num_queries=Q, enc_layers=E, dec_layers=D, swin_depths=depths, bert_layers=BL
        )
        j_logits, j_boxes = model.apply(
            params,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(bool)),
            text_self_mask=jnp.asarray(self_mask),
            position_ids=jnp.asarray(pos_ids.astype(np.int32)),
        )
        j_logits = np.asarray(j_logits)[0]
        j_boxes = np.asarray(j_boxes)[0]

        # top-k query ORDER can differ between jax.lax.top_k and torch.topk
        # on near-equal scores; require a bijective row matching instead
        ft = np.concatenate([t_boxes * 10, t_logits / 10], axis=1)
        fj = np.concatenate([j_boxes * 10, j_logits / 10], axis=1)
        dist = np.abs(ft[:, None] - fj[None, :]).max(-1)
        row_best = dist.argmin(1)
        assert dist[np.arange(Q), row_best].max() < 2e-2, dist.min(1).max()
        assert len(set(row_best.tolist())) == Q, "matching must be a bijection"
