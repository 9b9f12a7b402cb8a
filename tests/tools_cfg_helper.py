"""Shared helper: the shrunk UC2 config dict used by the golden fixture
generator and the interop test (kept in one place so they can't drift)."""


def make_ref_cfg_dict(n_blocks: int, *, hidden=96, heads=4, inter=384,
                      vocab=1000, vfeat=64, locs=7, labels=50):
    n = 2 * n_blocks
    evens = list(range(0, n, 2))
    odds = list(range(1, n, 2))
    return dict(
        attention_probs_dropout_prob=0.1, hidden_act="gelu",
        hidden_dropout_prob=0.1, hidden_size=hidden, initializer_range=0.02,
        intermediate_size=inter, max_position_embeddings=514,
        num_attention_heads=heads, pooler_size=hidden, type_vocab_size=2,
        vocab_size=vocab, pad_token_id=1, num_locs=locs,
        add_global_imgfeat=None, image_embeddings="uc2", model="roberta",
        v_attention_probs_dropout_prob=0.1, v_hidden_act="gelu",
        v_hidden_dropout_prob=0.1, v_feature_size=vfeat,
        visual_target_weights={"0": 1.0}, v_hidden_size=hidden,
        v_initializer_range=0.02, v_pooler_size=hidden,
        v_num_attention_heads=heads, v_intermediate_size=inter,
        layer_norm_eps=1e-5, fusion_method="text", clf_hidden_size=hidden,
        tt_attn_sublayers=evens, tv_attn_sublayers=evens,
        vt_attn_sublayers=evens, vv_attn_sublayers=evens,
        t_ff_sublayers=odds, v_ff_sublayers=odds,
        shared_sublayers=list(range(n)), single_ln_sublayers=list(range(n)),
        sublayer2attn_hidden_size={}, sublayer2num_attention_heads={},
        sublayer2intermediate_size={}, sublayer2v_attn_hidden_size={},
        sublayer2v_num_attention_heads={}, sublayer2v_intermediate_size={},
        bert_layer2attn_sublayer={str(i): 2 * i for i in range(n_blocks)},
        bert_layer2ff_sublayer={str(i): 2 * i + 1 for i in range(n_blocks)},
    )
