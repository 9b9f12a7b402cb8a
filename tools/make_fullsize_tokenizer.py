"""Construct a FULL-SIZE (250,002-piece) XLM-R-layout Unigram tokenizer
offline — the cost model for the production tokenizer.

The reference's production path tokenizes with HF AutoTokenizer
("xlm-roberta-base" sentencepiece Unigram, volta/volta/task_utils.py:468);
this environment has no network, so every throughput number so far rode
either the FNV HashTokenizer or the 400-piece tiny fixture
(tools/make_tiny_tokenizer.py) — neither exercises the real 250k-piece
Viterbi segmentation cost. Training a genuine 250k Unigram would need a
multi-GB corpus; instead this CONSTRUCTS the tokenizer.json directly:

 - XLM-R's exact special layout (<s>=0, <pad>=1, </s>=2, <unk>=3,
   post-processor adds <s> ... </s>) — same contract as the fixture;
 - every ASCII printable char and its metaspace twin ("▁x") so any input
   segments without unks;
 - "▁word" whole-word pieces + their 2..6-char prefix fragments for the
   GQA vocabulary (words harvested from the reference's shipped
   annotations when present) — this reproduces the TRIE DENSITY around
   real English questions, which is what the Unigram lattice cost scales
   with (the Viterbi over each position's matching prefixes);
 - Zipf-length random pieces over five unicode scripts up to 250,002 —
   the multilingual bulk that inflates vocab-proportional costs (score
   table size, id lookup) without matching English text.

Runtime uses the SAME Rust `tokenizers` Unigram engine HF's fast
xlm-roberta-base wrapper runs in production, so latency per question is
representative even though the inventory is synthetic.

Usage: python tools/make_fullsize_tokenizer.py [--out DIR] [--vocab N]
"""
import argparse
import json
import os
import random

REF_ANN = ("/root/reference/datasets/gqa/annotations/"
           "testdev_balanced_questions.json")

FALLBACK_WORDS = """the is are was were a an of on in to at by for with
what which where who how many much color side left right behind front
near next above below small large red blue green yellow white black
brown man woman child people dog cat car bus truck table chair window
door tree grass water sky plate bench shirt shoes lamp fence boat
umbrella kitchen counter apples bananas oranges furniture television
mirrors windows photo image picture standing sitting holding wearing
looking there does do you see either any both open and or not it this
that""".split()


def harvest_words() -> list[str]:
    words: dict[str, int] = {}
    if os.path.exists(REF_ANN):
        ann = json.load(open(REF_ANN))
        qs = (e["question"] for e in ann.values()) if isinstance(ann, dict) \
            else (e["question"] for e in ann)
        for q in qs:
            for w in q.lower().replace("?", " ").replace(",", " ").split():
                words[w] = words.get(w, 0) + 1
    for w in FALLBACK_WORDS:
        words.setdefault(w, 1)
    return [w for w, _ in
            sorted(words.items(), key=lambda kv: -kv[1])]


SCRIPTS = [(0x61, 26), (0x430, 32), (0x4e00, 2000), (0x621, 25),
           (0x905, 40)]                      # latin/cyrillic/CJK/arabic/devanagari


def synth_piece(r: random.Random) -> str:
    base, span = SCRIPTS[r.randrange(len(SCRIPTS))]
    ln = min(1 + int(r.paretovariate(1.2)), 12)
    s = "".join(chr(base + r.randrange(span)) for _ in range(ln))
    return ("▁" + s) if r.random() < 0.6 else s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fullsize_xlmr_tok")
    ap.add_argument("--vocab", type=int, default=250_002)
    args = ap.parse_args()

    pieces: dict[str, float] = {}

    def add(p: str, score: float):
        if p not in pieces:
            pieces[p] = score

    # char fallback layer (worst score, like sentencepiece's char coverage)
    for c in (chr(i) for i in range(0x21, 0x7f)):
        add(c, -13.0)
        add("▁" + c, -12.5)
    add("▁", -11.0)

    words = harvest_words()
    for rank, w in enumerate(words):
        add("▁" + w, -3.0 - 0.01 * rank)
        add(w, -6.0 - 0.01 * rank)
        for ln in range(2, min(len(w), 6)):
            add(w[:ln], -9.0 - 0.2 * ln)        # prefix fragments
            add(w[-ln:], -9.5 - 0.2 * ln)       # suffix fragments

    r = random.Random(0)
    while len(pieces) < args.vocab - 4:
        add(synth_piece(r), -8.0 - 6.0 * r.random())

    vocab = ([["<s>", 0.0], ["<pad>", 0.0], ["</s>", 0.0], ["<unk>", -15.0]]
             + [[p, s] for p, s in pieces.items()])

    tok_json = {
        "version": "1.0",
        "truncation": None, "padding": None,
        "added_tokens": [
            {"id": i, "content": t, "single_word": False, "lstrip": False,
             "rstrip": False, "normalized": False, "special": True}
            for i, t in enumerate(["<s>", "<pad>", "</s>", "<unk>"])],
        "normalizer": {"type": "Sequence",
                       "normalizers": [{"type": "NFKC"}]},
        "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                          "prepend_scheme": "always", "split": True},
        "post_processor": {
            "type": "TemplateProcessing",
            "single": [{"SpecialToken": {"id": "<s>", "type_id": 0}},
                       {"Sequence": {"id": "A", "type_id": 0}},
                       {"SpecialToken": {"id": "</s>", "type_id": 0}}],
            "pair": [{"SpecialToken": {"id": "<s>", "type_id": 0}},
                     {"Sequence": {"id": "A", "type_id": 0}},
                     {"SpecialToken": {"id": "</s>", "type_id": 0}},
                     {"SpecialToken": {"id": "</s>", "type_id": 0}},
                     {"Sequence": {"id": "B", "type_id": 0}},
                     {"SpecialToken": {"id": "</s>", "type_id": 0}}],
            "special_tokens": {
                "<s>": {"id": "<s>", "ids": [0], "tokens": ["<s>"]},
                "</s>": {"id": "</s>", "ids": [2], "tokens": ["</s>"]}}},
        "decoder": {"type": "Metaspace", "replacement": "▁",
                    "prepend_scheme": "always", "split": True},
        "model": {"type": "Unigram", "unk_id": 3, "vocab": vocab,
                  "byte_fallback": False},
    }

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "tokenizer.json"), "w") as f:
        json.dump(tok_json, f, ensure_ascii=False)
    with open(os.path.join(args.out, "tokenizer_config.json"), "w") as f:
        json.dump({"tokenizer_class": "PreTrainedTokenizerFast",
                   "bos_token": "<s>", "eos_token": "</s>",
                   "unk_token": "<unk>", "pad_token": "<pad>",
                   "model_max_length": 512}, f, indent=1)
    with open(os.path.join(args.out, "special_tokens_map.json"), "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>",
                   "unk_token": "<unk>", "pad_token": "<pad>"}, f, indent=1)

    # smoke: load through the same path the pipeline uses
    from transformers import AutoTokenizer
    t = AutoTokenizer.from_pretrained(args.out)
    ids = t.encode("what color is the car on the left ?")
    assert ids[0] == 0 and ids[-1] == 2 and len(t) == args.vocab, (
        ids[:4], len(t))
    print(f"wrote {args.out}: {len(t)} pieces, sample encode -> {ids}")


if __name__ == "__main__":
    main()
