"""VOLTA gated-model state-dict <-> pytree converters (the zoo counterpart
of utils/convert.py's UC2 mapping).

Torch module paths (volta/volta/encoders.py BertForVLTasks):
  bert.embeddings.* / bert.v_embeddings.*        (embeddings zoo)
  bert.encoder.layer.{n}.attention_self.{query,key,value}[.v_*]
  bert.encoder.layer.{n}.attention_output.{dense,LayerNorm}[.v_*]
  bert.encoder.layer.{n}.{intermediate,output}.{dense,...}[.v_*]
  bert.t_pooler.dense / bert.v_pooler.dense
  clfs_dict.{task}.logit_fc.{0,2,3}

Sharing: when a sublayer shares text/vision weights, the reference ASSIGNS
the same nn.Parameter to both attribute paths, so the state dict carries
BOTH key families with identical tensors — the importer verifies equality
and keeps one copy; the exporter re-emits both aliases so reference-side
loads are key-complete.

Linear weights transpose torch's [out, in] to our [in, out]; LayerNorm
weight/bias become scale/bias; embedding tables pass through.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _lin(sd, key):
    return {"w": jnp.asarray(np.ascontiguousarray(sd[f"{key}.weight"].T)),
            "b": jnp.asarray(sd[f"{key}.bias"])}


def _ln(sd, key):
    return {"scale": jnp.asarray(sd[f"{key}.weight"]),
            "bias": jnp.asarray(sd[f"{key}.bias"])}


def _emb(sd, key):
    return jnp.asarray(sd[f"{key}.weight"])


def _text_embeddings(sd, prefix):
    return {"word": _emb(sd, f"{prefix}.word_embeddings"),
            "position": _emb(sd, f"{prefix}.position_embeddings"),
            "token_type": _emb(sd, f"{prefix}.token_type_embeddings"),
            "ln": _ln(sd, f"{prefix}.LayerNorm")}


def _embeddings_to_pytree(sd, cfg):
    p = "bert.embeddings"
    if cfg.image_embeddings in ("vilbert", "lxmert"):
        img = {"image": _lin(sd, f"bert.v_embeddings.image_embeddings"),
               "loc": _lin(sd, f"bert.v_embeddings.image_location_embeddings")}
        if cfg.image_embeddings == "lxmert":
            img["img_ln"] = _ln(sd, "bert.v_embeddings.ImgLayerNorm")
            img["loc_ln"] = _ln(sd, "bert.v_embeddings.LocLayerNorm")
        else:
            img["ln"] = _ln(sd, "bert.v_embeddings.LayerNorm")
        return {"text": _text_embeddings(sd, p), "image": img}
    if cfg.image_embeddings == "visualbert":
        out = _text_embeddings(sd, p)
        out["projection"] = _lin(sd, f"{p}.projection")
        out["v_token_type"] = _emb(sd, f"{p}.token_type_embeddings_visual")
        out["v_position"] = _emb(sd, f"{p}.position_embeddings_visual")
        return out
    if cfg.image_embeddings == "uniter":
        out = _text_embeddings(sd, p)
        out["image"] = _lin(sd, f"{p}.image_embeddings")
        out["loc"] = _lin(sd, f"{p}.image_location_embeddings")
        if cfg.model == "roberta":
            out["image_token_type"] = _emb(
                sd, f"{p}.image_token_type_embeddings")
        out["image_ln"] = _ln(sd, f"{p}.image_layer_norm")
        out["loc_ln"] = _ln(sd, f"{p}.image_location_layer_norm")
        out["v_ln"] = _ln(sd, f"{p}.v_LayerNorm")
        return out
    if cfg.image_embeddings == "vl-bert":
        out = {
            "word": _emb(sd, f"{p}.word_embeddings"),
            "position": _emb(sd, f"{p}.position_embeddings"),
            "token_type": _emb(sd, f"{p}.token_type_embeddings"),
            "obj_downsample": _lin(sd, f"{p}.obj_downsample.1"),
            "object_linguistic": _emb(sd,
                                      f"{p}.object_linguistic_embeddings"),
            "object_mask_visual": _emb(sd,
                                       f"{p}.object_mask_visual_embedding"),
            "end": _emb(sd, f"{p}.end_embedding"),
            "visual_ln_text": _ln(sd, f"{p}.visual_ln_text"),
            "visual_ln_object": _ln(sd, f"{p}.visual_ln_object"),
            "ln": _ln(sd, f"{p}.LayerNorm"),
        }
        if f"{p}.visual_1x1_text.weight" in sd:
            out["visual_1x1_text"] = _lin(sd, f"{p}.visual_1x1_text")
            out["visual_1x1_object"] = _lin(sd, f"{p}.visual_1x1_object")
        if f"{p}.object_mask_word_embedding.weight" in sd:
            out["object_mask_word"] = _emb(
                sd, f"{p}.object_mask_word_embedding")
        return out
    raise ValueError(cfg.image_embeddings)


def volta_gated_to_pytree(sd: dict, cfg) -> dict:
    """Torch BertForVLTasks state dict -> models/gated.py pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {"embeddings": _embeddings_to_pytree(sd, cfg), "sublayers": []}
    for n in range(cfg.depth):
        lp = f"bert.encoder.layer.{n}"
        has_tt = n in cfg.tt_attn_sublayers
        has_tv = n in cfg.tv_attn_sublayers
        has_vt = n in cfg.vt_attn_sublayers
        has_vv = n in cfg.vv_attn_sublayers
        shared = n in cfg.shared_sublayers
        p = {}
        if cfg.sub_kind(n) == "attn":
            has_text = has_tt or has_tv
            has_vision = has_vv or has_vt
            if has_text:
                p["t"] = {"q": _lin(sd, f"{lp}.attention_self.query"),
                          "k": _lin(sd, f"{lp}.attention_self.key"),
                          "v": _lin(sd, f"{lp}.attention_self.value")}
                p["t_out"] = {
                    "dense": _lin(sd, f"{lp}.attention_output.dense"),
                    "ln": _ln(sd, f"{lp}.attention_output.LayerNorm")}
            if has_vision and not (has_text and shared):
                p["v"] = {"q": _lin(sd, f"{lp}.attention_self.v_query"),
                          "k": _lin(sd, f"{lp}.attention_self.v_key"),
                          "v": _lin(sd, f"{lp}.attention_self.v_value")}
                p["v_out"] = {
                    "dense": _lin(sd, f"{lp}.attention_output.v_dense"),
                    "ln": _ln(sd, f"{lp}.attention_output.v_LayerNorm")}
            elif has_vision:   # shared: the v_* keys must be exact aliases
                for a, b in ((f"{lp}.attention_self.v_query.weight",
                              f"{lp}.attention_self.query.weight"),
                             (f"{lp}.attention_output.v_dense.weight",
                              f"{lp}.attention_output.dense.weight")):
                    if a in sd and not np.array_equal(sd[a], sd[b]):
                        raise ValueError(f"shared sublayer {n}: {a} != {b}")
        else:
            has_t = n in cfg.t_ff_sublayers
            has_v = n in cfg.v_ff_sublayers
            if has_t:
                p["t"] = {"w1": _lin(sd, f"{lp}.intermediate.dense"),
                          "w2": _lin(sd, f"{lp}.output.dense"),
                          "ln": _ln(sd, f"{lp}.output.LayerNorm")}
            if has_v and not (has_t and shared):
                p["v"] = {"w1": _lin(sd, f"{lp}.intermediate.v_dense"),
                          "w2": _lin(sd, f"{lp}.output.v_dense"),
                          "ln": _ln(sd, f"{lp}.output.v_LayerNorm")}
        params["sublayers"].append(p)

    if "bert.t_pooler.dense.weight" in sd:
        params["t_pooler"] = _lin(sd, "bert.t_pooler.dense")
    if "bert.v_pooler.dense.weight" in sd:
        params["v_pooler"] = _lin(sd, "bert.v_pooler.dense")
    for k in sd:
        if k.startswith("clfs_dict.") and k.endswith("logit_fc.0.weight"):
            task = k.split(".")[1]
            params["classifier"] = {
                "fc1": _lin(sd, f"clfs_dict.{task}.logit_fc.0"),
                "ln": _ln(sd, f"clfs_dict.{task}.logit_fc.2"),
                "fc2": _lin(sd, f"clfs_dict.{task}.logit_fc.3"),
            }
            break
    params["sublayers"] = tuple(params["sublayers"])
    return params


def pytree_to_volta_gated(params: dict, cfg, task: str = "TASK15") -> dict:
    """models/gated.py pytree -> torch-naming state dict (incl. the v_*
    aliases for shared sublayers so reference loads are key-complete)."""
    out: dict[str, np.ndarray] = {}

    def w(key, arr):
        out[key] = np.ascontiguousarray(np.asarray(arr))

    def lin(key, p):
        w(f"{key}.weight", np.asarray(p["w"]).T)
        w(f"{key}.bias", p["b"])

    def ln(key, p):
        w(f"{key}.weight", p["scale"])
        w(f"{key}.bias", p["bias"])

    e = params["embeddings"]
    p = "bert.embeddings"
    if cfg.image_embeddings in ("vilbert", "lxmert"):
        t = e["text"]
        w(f"{p}.word_embeddings.weight", t["word"])
        w(f"{p}.position_embeddings.weight", t["position"])
        w(f"{p}.token_type_embeddings.weight", t["token_type"])
        ln(f"{p}.LayerNorm", t["ln"])
        img = e["image"]
        lin("bert.v_embeddings.image_embeddings", img["image"])
        lin("bert.v_embeddings.image_location_embeddings", img["loc"])
        if cfg.image_embeddings == "lxmert":
            ln("bert.v_embeddings.ImgLayerNorm", img["img_ln"])
            ln("bert.v_embeddings.LocLayerNorm", img["loc_ln"])
        else:
            ln("bert.v_embeddings.LayerNorm", img["ln"])
    elif cfg.image_embeddings == "visualbert":
        w(f"{p}.word_embeddings.weight", e["word"])
        w(f"{p}.position_embeddings.weight", e["position"])
        w(f"{p}.token_type_embeddings.weight", e["token_type"])
        ln(f"{p}.LayerNorm", e["ln"])
        lin(f"{p}.projection", e["projection"])
        w(f"{p}.token_type_embeddings_visual.weight", e["v_token_type"])
        w(f"{p}.position_embeddings_visual.weight", e["v_position"])
    elif cfg.image_embeddings == "uniter":
        w(f"{p}.word_embeddings.weight", e["word"])
        w(f"{p}.position_embeddings.weight", e["position"])
        w(f"{p}.token_type_embeddings.weight", e["token_type"])
        ln(f"{p}.LayerNorm", e["ln"])
        lin(f"{p}.image_embeddings", e["image"])
        lin(f"{p}.image_location_embeddings", e["loc"])
        if "image_token_type" in e:
            w(f"{p}.image_token_type_embeddings.weight",
              e["image_token_type"])
        ln(f"{p}.image_layer_norm", e["image_ln"])
        ln(f"{p}.image_location_layer_norm", e["loc_ln"])
        ln(f"{p}.v_LayerNorm", e["v_ln"])
    elif cfg.image_embeddings == "vl-bert":
        w(f"{p}.word_embeddings.weight", e["word"])
        w(f"{p}.position_embeddings.weight", e["position"])
        w(f"{p}.token_type_embeddings.weight", e["token_type"])
        lin(f"{p}.obj_downsample.1", e["obj_downsample"])
        w(f"{p}.object_linguistic_embeddings.weight", e["object_linguistic"])
        w(f"{p}.object_mask_visual_embedding.weight",
          e["object_mask_visual"])
        w(f"{p}.end_embedding.weight", e["end"])
        ln(f"{p}.visual_ln_text", e["visual_ln_text"])
        ln(f"{p}.visual_ln_object", e["visual_ln_object"])
        ln(f"{p}.LayerNorm", e["ln"])
        if "visual_1x1_text" in e:
            lin(f"{p}.visual_1x1_text", e["visual_1x1_text"])
            lin(f"{p}.visual_1x1_object", e["visual_1x1_object"])
        if "object_mask_word" in e:
            w(f"{p}.object_mask_word_embedding.weight",
              e["object_mask_word"])

    for n, sp in enumerate(params["sublayers"]):
        lp = f"bert.encoder.layer.{n}"
        has_tt = n in cfg.tt_attn_sublayers
        has_tv = n in cfg.tv_attn_sublayers
        has_vt = n in cfg.vt_attn_sublayers
        has_vv = n in cfg.vv_attn_sublayers
        shared = n in cfg.shared_sublayers
        if cfg.sub_kind(n) == "attn":
            has_text = has_tt or has_tv
            has_vision = has_vv or has_vt
            if has_text:
                lin(f"{lp}.attention_self.query", sp["t"]["q"])
                lin(f"{lp}.attention_self.key", sp["t"]["k"])
                lin(f"{lp}.attention_self.value", sp["t"]["v"])
                lin(f"{lp}.attention_output.dense", sp["t_out"]["dense"])
                ln(f"{lp}.attention_output.LayerNorm", sp["t_out"]["ln"])
            vsrc = sp.get("v", sp.get("t") if (has_text and shared) else None)
            vosrc = sp.get("v_out",
                           sp.get("t_out") if (has_text and shared) else None)
            if has_vision:
                lin(f"{lp}.attention_self.v_query", vsrc["q"])
                lin(f"{lp}.attention_self.v_key", vsrc["k"])
                lin(f"{lp}.attention_self.v_value", vsrc["v"])
                lin(f"{lp}.attention_output.v_dense", vosrc["dense"])
                ln(f"{lp}.attention_output.v_LayerNorm", vosrc["ln"])
        else:
            has_t = n in cfg.t_ff_sublayers
            has_v = n in cfg.v_ff_sublayers
            if has_t:
                lin(f"{lp}.intermediate.dense", sp["t"]["w1"])
                lin(f"{lp}.output.dense", sp["t"]["w2"])
                ln(f"{lp}.output.LayerNorm", sp["t"]["ln"])
            vsrc = sp.get("v", sp.get("t") if (has_t and shared) else None)
            if has_v:
                lin(f"{lp}.intermediate.v_dense", vsrc["w1"])
                lin(f"{lp}.output.v_dense", vsrc["w2"])
                ln(f"{lp}.output.v_LayerNorm", vsrc["ln"])

    if "t_pooler" in params:
        lin("bert.t_pooler.dense", params["t_pooler"])
    if "v_pooler" in params:
        lin("bert.v_pooler.dense", params["v_pooler"])
    c = params["classifier"]
    lin(f"clfs_dict.{task}.logit_fc.0", c["fc1"])
    ln(f"clfs_dict.{task}.logit_fc.2", c["ln"])
    lin(f"clfs_dict.{task}.logit_fc.3", c["fc2"])
    return out
