"""Checkpoint ingest: torch/VOLTA state_dicts -> framework pytrees.

Reproduces the key-remapping pipeline of the reference's
``PreTrainedModel.from_pretrained`` (volta/volta/utils.py:455-518):
 1. gamma/beta -> weight/bias,
 2. HF BERT layer-number -> VOLTA sublayer renumbering via
    bert_layer2attn_sublayer / bert_layer2ff_sublayer,
 3. roberta->bert + lm_head renames,
 4. "module." (DDP) prefix stripping (train_utils.py:496-501),
then maps VOLTA parameter names onto our stacked-layer pytree. Torch Linear
weights [out, in] are transposed to [in, out].

All inputs are plain numpy mappings (call ``{k: v.numpy() for k, v in
torch.load(f).items()}`` first); this module does not import torch.
"""
from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ..config import UC2Config


def normalize_volta_keys(sd: Mapping[str, np.ndarray], *, from_hf: bool = False,
                         layer2attn: Mapping[str, int] | None = None,
                         layer2ff: Mapping[str, int] | None = None,
                         ) -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    for k, v in sd.items():
        nk = k
        if nk.startswith("module."):
            nk = nk[len("module."):]
        nk = nk.replace("gamma", "weight").replace("beta", "bias")
        if from_hf and ".layer." in nk:
            num = nk.split(".layer.")[-1].split(".")[0]
            if ".attention." in nk and layer2attn:
                nk = nk.replace(f".layer.{num}.attention.",
                                f".layer.{layer2attn[num]}.attention_")
            elif ".intermediate." in nk and layer2ff:
                nk = nk.replace(f".layer.{num}.intermediate.",
                                f".layer.{layer2ff[num]}.intermediate.")
            elif ".output." in nk and layer2ff:
                nk = nk.replace(f".layer.{num}.output.",
                                f".layer.{layer2ff[num]}.output.")
        nk = nk.replace("roberta", "bert")
        nk = nk.replace("lm_head.dense", "cls.predictions.transform.dense")
        nk = nk.replace("lm_head.layer_norm", "cls.predictions.transform.LayerNorm")
        out[nk] = np.asarray(v)
    return out


def _lin(sd, name):
    return {"w": sd[f"{name}.weight"].T.astype(np.float32),
            "b": sd[f"{name}.bias"].astype(np.float32)}


def _ln(sd, name):
    return {"scale": sd[f"{name}.weight"].astype(np.float32),
            "bias": sd[f"{name}.bias"].astype(np.float32)}


def volta_uc2_to_pytree(sd: Mapping[str, np.ndarray], cfg: UC2Config,
                        task_key: str = "TASK15") -> dict:
    """Map a (normalized) VOLTA UC2 state_dict to our UC2 params pytree.

    VOLTA stores the shared text/vision weights under both plain and ``v_``
    names (e.g. attention_self.query and attention_self.v_query point at the
    same tensor, encoders.py:209-214); we read the plain names and verify the
    aliases when present.
    """
    nL = cfg.num_layers
    emb = "bert.embeddings"
    params = {
        "embeddings": {
            "word": sd[f"{emb}.word_embeddings.weight"].astype(np.float32),
            "position": sd[f"{emb}.position_embeddings.weight"].astype(np.float32),
            "token_type": sd[f"{emb}.new_token_type_embeddings.weight"].astype(np.float32),
            "ln": _ln(sd, f"{emb}.LayerNorm"),
            "image": _lin(sd, f"{emb}.image_embeddings"),
            "loc": _lin(sd, f"{emb}.image_location_embeddings"),
            "image_ln": _ln(sd, f"{emb}.image_layer_norm"),
            "loc_ln": _ln(sd, f"{emb}.image_location_layer_norm"),
            "v_ln": _ln(sd, f"{emb}.v_LayerNorm"),
        },
    }

    def stack(fn):
        mats = [fn(b) for b in range(nL)]
        return {k: np.stack([m[k] for m in mats]) for k in mats[0]}

    lyr = "bert.encoder.layer"
    params["encoder"] = {
        "attn": {
            "q": stack(lambda b: _lin(sd, f"{lyr}.{2*b}.attention_self.query")),
            "k": stack(lambda b: _lin(sd, f"{lyr}.{2*b}.attention_self.key")),
            "v": stack(lambda b: _lin(sd, f"{lyr}.{2*b}.attention_self.value")),
            "o": stack(lambda b: _lin(sd, f"{lyr}.{2*b}.attention_output.dense")),
        },
        "ln1": stack(lambda b: _ln(sd, f"{lyr}.{2*b}.attention_output.LayerNorm")),
        "ffn": {
            "w1": stack(lambda b: _lin(sd, f"{lyr}.{2*b+1}.intermediate.dense")),
            "w2": stack(lambda b: _lin(sd, f"{lyr}.{2*b+1}.output.dense")),
        },
        "ln2": stack(lambda b: _ln(sd, f"{lyr}.{2*b+1}.output.LayerNorm")),
    }

    # shared-weight aliases must agree if present
    for b in range(nL):
        for a, bname in (("query", "v_query"), ("key", "v_key"),
                         ("value", "v_value")):
            vk = f"{lyr}.{2*b}.attention_self.{bname}.weight"
            if vk in sd:
                assert np.array_equal(sd[vk],
                                      sd[f"{lyr}.{2*b}.attention_self.{a}.weight"]), \
                    f"unshared {vk} in supposedly shared checkpoint"

    params["pooler"] = _lin(sd, "bert.t_pooler.dense")
    clf = f"clfs_dict.{task_key}.logit_fc"
    if f"{clf}.0.weight" in sd:
        params["classifier"] = {
            "fc1": _lin(sd, f"{clf}.0"),
            "ln": _ln(sd, f"{clf}.2"),
            "fc2": _lin(sd, f"{clf}.3"),
        }
    return params


def hf_xlmr_to_uc2_pytree(sd: Mapping[str, np.ndarray], cfg: UC2Config,
                          *, seed: int = 0) -> dict:
    """Raw HF XLM-R state dict -> UC2 params pytree, via the sublayer
    collapse renumbering the reference's conversions/convert_uc2.py:26
    applies (from_pretrained(from_hf=True), utils.py:483-518): HF layer i
    maps to volta attn sublayer 2i / ff sublayer 2i+1 (exactly
    uc2_base.json's bert_layer2attn_sublayer / bert_layer2ff_sublayer).
    Keys the HF checkpoint does not carry (image embeddings, pooler,
    classifier, token-type) keep a fresh init — the reference's
    strict=False load behaves the same (missing keys stay initialized)."""
    import jax

    from ..models import uc2
    L = cfg.num_layers
    norm = normalize_volta_keys(
        sd, from_hf=True,
        layer2attn={str(i): 2 * i for i in range(L)},
        layer2ff={str(i): 2 * i + 1 for i in range(L)})
    base = pytree_to_volta_uc2(uc2.init_params(jax.random.key(seed), cfg))
    merged = {**base, **{k: v for k, v in norm.items() if k in base}}
    return volta_uc2_to_pytree(merged, cfg)


def pytree_to_volta_uc2(params, task_key: str = "TASK15") -> dict[str, np.ndarray]:
    """Inverse mapping, for exporting checkpoints the reference stack can load
    (including the ``v_`` aliases for shared weights)."""
    sd: dict[str, np.ndarray] = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    e = params["embeddings"]
    emb = "bert.embeddings"
    sd[f"{emb}.word_embeddings.weight"] = np.asarray(e["word"])
    sd[f"{emb}.position_embeddings.weight"] = np.asarray(e["position"])
    sd[f"{emb}.new_token_type_embeddings.weight"] = np.asarray(e["token_type"])
    put_ln(f"{emb}.LayerNorm", e["ln"])
    put_lin(f"{emb}.image_embeddings", e["image"])
    put_lin(f"{emb}.image_location_embeddings", e["loc"])
    put_ln(f"{emb}.image_layer_norm", e["image_ln"])
    put_ln(f"{emb}.image_location_layer_norm", e["loc_ln"])
    put_ln(f"{emb}.v_LayerNorm", e["v_ln"])

    enc = params["encoder"]
    nL = np.asarray(enc["ln1"]["scale"]).shape[0]
    lyr = "bert.encoder.layer"
    for b in range(nL):
        for src, names in (("q", ["query", "v_query"]), ("k", ["key", "v_key"]),
                           ("v", ["value", "v_value"])):
            p = {k: np.asarray(v)[b] for k, v in enc["attn"][src].items()}
            for n in names:
                put_lin(f"{lyr}.{2*b}.attention_self.{n}", p)
        po = {k: np.asarray(v)[b] for k, v in enc["attn"]["o"].items()}
        put_lin(f"{lyr}.{2*b}.attention_output.dense", po)
        put_lin(f"{lyr}.{2*b}.attention_output.v_dense", po)
        put_ln(f"{lyr}.{2*b}.attention_output.LayerNorm",
               {k: np.asarray(v)[b] for k, v in enc["ln1"].items()})
        p1 = {k: np.asarray(v)[b] for k, v in enc["ffn"]["w1"].items()}
        p2 = {k: np.asarray(v)[b] for k, v in enc["ffn"]["w2"].items()}
        put_lin(f"{lyr}.{2*b+1}.intermediate.dense", p1)
        put_lin(f"{lyr}.{2*b+1}.intermediate.v_dense", p1)
        put_lin(f"{lyr}.{2*b+1}.output.dense", p2)
        put_lin(f"{lyr}.{2*b+1}.output.v_dense", p2)
        put_ln(f"{lyr}.{2*b+1}.output.LayerNorm",
               {k: np.asarray(v)[b] for k, v in enc["ln2"].items()})

    put_lin("bert.t_pooler.dense", params["pooler"])
    if "classifier" in params:
        c = params["classifier"]
        put_lin(f"clfs_dict.{task_key}.logit_fc.0", c["fc1"])
        put_ln(f"clfs_dict.{task_key}.logit_fc.2", c["ln"])
        put_lin(f"clfs_dict.{task_key}.logit_fc.3", c["fc2"])
    return sd


# ---------------------------------------------------------------------------
# M3P (volta/volta/m3p_transformer.py:609-750 parameter names; only the
# jointfwd-path modules are mapped — AoA refiner, VAE latent transforms,
# encoder_attn, generation heads are never touched by CLG-VQA's VQA path and
# are ignored here, mirroring the prefix-tolerant load in utils.py:530-552).
# ---------------------------------------------------------------------------

def volta_m3p_to_pytree(sd: Mapping[str, np.ndarray], cfg,
                        task_key: str = "TASK15") -> dict:
    nL = cfg.num_layers
    enc = "bert.encoder"
    params = {
        "embeddings": {
            "word": sd[f"{enc}.embeddings.weight"].astype(np.float32),
            "position": sd[f"{enc}.position_embeddings.weight"].astype(np.float32),
            "ln": _ln(sd, f"{enc}.layer_norm_emb"),
            "image": _lin(sd, f"{enc}.image_embeddings.image_embeddings"),
            "loc": _lin(sd, f"{enc}.image_embeddings.image_location_embeddings"),
            "img_ln": _ln(sd, f"{enc}.image_embeddings.LayerNorm"),
        },
    }

    def stack(fn):
        mats = [fn(i) for i in range(nL)]
        return {k: np.stack([m[k] for m in mats]) for k in mats[0]}

    params["encoder"] = {
        "attn": {
            "q": stack(lambda i: _lin(sd, f"{enc}.attentions.{i}.q_lin")),
            "k": stack(lambda i: _lin(sd, f"{enc}.attentions.{i}.k_lin")),
            "v": stack(lambda i: _lin(sd, f"{enc}.attentions.{i}.v_lin")),
            "o": stack(lambda i: _lin(sd, f"{enc}.attentions.{i}.out_lin")),
        },
        "ln1": stack(lambda i: _ln(sd, f"{enc}.layer_norm1.{i}")),
        "ffn": {
            "w1": stack(lambda i: _lin(sd, f"{enc}.ffns.{i}.lin1")),
            "w2": stack(lambda i: _lin(sd, f"{enc}.ffns.{i}.lin2")),
        },
        "ln2": stack(lambda i: _ln(sd, f"{enc}.layer_norm2.{i}")),
    }
    params["pooler"] = _lin(sd, f"{enc}.pooled_layer.dense")
    clf = f"clfs_dict.{task_key}.logit_fc"
    if f"{clf}.0.weight" in sd:
        params["classifier"] = {
            "fc1": _lin(sd, f"{clf}.0"),
            "ln": _ln(sd, f"{clf}.2"),
            "fc2": _lin(sd, f"{clf}.3"),
        }
    return params


def m3p_original_to_pytree(sd: Mapping[str, np.ndarray], cfg,
                           *, seed: int = 0) -> dict:
    """Original microsoft/M3P pretrained checkpoint (``module.*`` names:
    attentions.N.q_lin, ffns.N.lin1, layer_norm1/2.N, image_embeddings,
    pooled_layer — the inventory the reference's conversion notebooks
    remap, conversions/M3P*.ipynb + m3p_body2volta.json) -> our M3P
    params pytree. VOLTA's M3P model keeps the original module naming
    internally (m3p_transformer.py:138-178,668-671), so the body maps by
    the ``module.`` -> ``bert.encoder.`` prefix; anything the original
    checkpoint lacks (classifier, extra heads) keeps a fresh init."""
    import jax

    from ..models import m3p
    norm = {"bert.encoder." + k[len("module."):]: np.asarray(v)
            for k, v in sd.items() if k.startswith("module.")}
    base = pytree_to_volta_m3p(m3p.init_params(jax.random.key(seed), cfg))
    merged = {**base, **{k: v for k, v in norm.items() if k in base}}
    return volta_m3p_to_pytree(merged, cfg)


def pytree_to_volta_m3p(params, task_key: str = "TASK15") -> dict[str, np.ndarray]:
    sd: dict[str, np.ndarray] = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"]).T
        sd[f"{name}.bias"] = np.asarray(p["b"])

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    e = params["embeddings"]
    enc = "bert.encoder"
    sd[f"{enc}.embeddings.weight"] = np.asarray(e["word"])
    sd[f"{enc}.position_embeddings.weight"] = np.asarray(e["position"])
    put_ln(f"{enc}.layer_norm_emb", e["ln"])
    put_lin(f"{enc}.image_embeddings.image_embeddings", e["image"])
    put_lin(f"{enc}.image_embeddings.image_location_embeddings", e["loc"])
    put_ln(f"{enc}.image_embeddings.LayerNorm", e["img_ln"])

    p_enc = params["encoder"]
    nL = np.asarray(p_enc["ln1"]["scale"]).shape[0]
    for i in range(nL):
        for src, name in (("q", "q_lin"), ("k", "k_lin"), ("v", "v_lin"),
                          ("o", "out_lin")):
            put_lin(f"{enc}.attentions.{i}.{name}",
                    {k: np.asarray(v)[i] for k, v in p_enc["attn"][src].items()})
        put_ln(f"{enc}.layer_norm1.{i}",
               {k: np.asarray(v)[i] for k, v in p_enc["ln1"].items()})
        put_lin(f"{enc}.ffns.{i}.lin1",
                {k: np.asarray(v)[i] for k, v in p_enc["ffn"]["w1"].items()})
        put_lin(f"{enc}.ffns.{i}.lin2",
                {k: np.asarray(v)[i] for k, v in p_enc["ffn"]["w2"].items()})
        put_ln(f"{enc}.layer_norm2.{i}",
               {k: np.asarray(v)[i] for k, v in p_enc["ln2"].items()})
    put_lin(f"{enc}.pooled_layer.dense", params["pooler"])
    if "classifier" in params:
        c = params["classifier"]
        put_lin(f"clfs_dict.{task_key}.logit_fc.0", c["fc1"])
        put_ln(f"clfs_dict.{task_key}.logit_fc.2", c["ln"])
        put_lin(f"clfs_dict.{task_key}.logit_fc.3", c["fc2"])
    return sd


def m3p_gen_components_to_pytree(sd: Mapping[str, np.ndarray], cfg,
                                 *, prefix: str = "",
                                 refine_layers: int = 3) -> dict:
    """Map the M3P GENERATION-path components (transformer-level names, as
    in the original checkpoints' ``module.*`` inventory and
    M3PTransformerModel.state_dict()) to the ``params["gen"]`` subtree of
    models/m3p_gen.py: per-layer encoder_attn + layer_norm15, the tied
    PredLayer bias (the proj weight IS embeddings.weight,
    m3p_transformer.py:727-728 — only the bias is stored separately), the
    AoA refiner stack (whose output_layer is deleted when do_aoa, so no
    key exists for it), the understanding heads, and the first
    VaeEncoder/LatentDecoder pair (latent_transforms.0 /
    original_transforms.0)."""
    import numpy as _np

    def g(name):
        return _np.asarray(sd[prefix + name])

    def lin(name):
        return {"w": jnp.asarray(_np.ascontiguousarray(g(f"{name}.weight").T)),
                "b": jnp.asarray(g(f"{name}.bias"))}

    def ln(name):
        return {"scale": jnp.asarray(g(f"{name}.weight")),
                "bias": jnp.asarray(g(f"{name}.bias"))}

    nL = cfg.num_layers

    def stack_lin(fmt):
        return {"w": jnp.stack([jnp.asarray(_np.ascontiguousarray(
                    g(fmt.format(i) + ".weight").T)) for i in range(nL)]),
                "b": jnp.stack([jnp.asarray(g(fmt.format(i) + ".bias"))
                                for i in range(nL)])}

    def stack_ln(fmt):
        return {"scale": jnp.stack([jnp.asarray(g(fmt.format(i) + ".weight"))
                                    for i in range(nL)]),
                "bias": jnp.stack([jnp.asarray(g(fmt.format(i) + ".bias"))
                                   for i in range(nL)])}

    refiner = {
        "layers": tuple(
            {"attn": {"q": lin(f"refine_embeddings.layers.{j}.self_attn"
                               f".linears.0"),
                      "k": lin(f"refine_embeddings.layers.{j}.self_attn"
                               f".linears.1"),
                      "v": lin(f"refine_embeddings.layers.{j}.self_attn"
                               f".linears.2")},
             "aoa": lin(f"refine_embeddings.layers.{j}.self_attn"
                        f".aoa_layer.0"),
             "ln_a": ln(f"refine_embeddings.layers.{j}.sublayer.0.norm"),
             "ln_b": ln(f"refine_embeddings.layers.{j}.sublayer.1.norm"),
             "ffn": {"w1": lin(f"refine_embeddings.layers.{j}"
                               f".feed_forward.lin1"),
                     "w2": lin(f"refine_embeddings.layers.{j}"
                               f".feed_forward.lin2")}}
            for j in range(refine_layers)),
        "norm": ln("refine_embeddings.norm"),
    }
    return {
        "encoder_attn": {
            "q": stack_lin("encoder_attn.{}.q_lin"),
            "k": stack_lin("encoder_attn.{}.k_lin"),
            "v": stack_lin("encoder_attn.{}.v_lin"),
            "o": stack_lin("encoder_attn.{}.out_lin")},
        "ln15": stack_ln("layer_norm15.{}"),
        "pred_bias": jnp.asarray(g("pred_layer.proj.bias")),
        "cross_lang": jnp.asarray(g("cross_lang_embeddings.weight")),
        "refiner": refiner,
        "seq_relationship": lin("seq_relationship"),
        "pooler2": lin("pooled_layer2.dense"),
        "seq_relationship2": lin("seq_relationship2"),
        "mrfr": lin("mrfr_dense"),
        "obj_transform": {"dense": lin("transformer_obj.dense"),
                          "ln": ln("transformer_obj.LayerNorm")},
        "obj_proj": lin("pred_obj_layer.proj"),
        "vae": {"x_to_mu": lin("latent_transforms.0.x_to_mu"),
                "x_to_logvar": lin("latent_transforms.0.x_to_logvar"),
                "out_dense": lin("latent_transforms.0.out_dense")},
        "latent_decoder": {"dense": lin("original_transforms.0.dense"),
                           "dense_mu": lin("original_transforms.0.dense_mu"),
                           "ln": ln("original_transforms.0.LayerNorm")},
    }
