"""Host tokenization cost: FNV hash vs tiny fixture vs FULL-SIZE 250k
Unigram (tools/make_fullsize_tokenizer.py) on real GQA questions.

Answers the round-4 verdict's open risk: every published host-pipeline
number rode the HashTokenizer (data/tokenizer.py) while production uses
HF XLM-R sentencepiece (task_utils.py:468) — if real tokenization were
5-10x slower than hashing, the measured 3.6x host headroom (5152 QA/s vs
the device's ~1430 QA/s consumption, docs/PERFORMANCE.md "Host input
pipeline") could vanish. This measures exactly the pipeline-relevant
quantity: encode_padded (encode + reference truncation + padding) per
question, the work GQADataset pays per row — up-front for static
questions, per-batch under CDM (data/gqa.py:121-143).

Usage: python tools/bench_tokenizer.py [--tok-dir /tmp/fullsize_xlmr_tok]
       [--seconds 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_ANN = ("/root/reference/datasets/gqa/annotations/"
           "testdev_balanced_questions.json")


def questions() -> list[str]:
    if os.path.exists(REF_ANN):
        ann = json.load(open(REF_ANN))
        qs = [e["question"] for e in ann.values()]
    else:   # fallback: synthetic GQA-flavoured questions
        qs = [f"what color is the {w} on the left ?"
              for w in ("car bus dog cat table chair lamp boat "
                        "plate bench fence tree").split()]
    return qs


def bench(tok, qs, seconds: float, max_len: int = 40):
    from clg_vqa_tpu.data.tokenizer import encode_padded
    # warmup + correctness: specials in place, padded length
    ids, mask, seg = encode_padded(tok, qs[0], max_len)
    assert len(ids) == max_len and ids[0] == tok.bos_id
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        encode_padded(tok, qs[n % len(qs)], max_len)
        n += 1
    dt = time.perf_counter() - t0
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tok-dir", default="/tmp/fullsize_xlmr_tok")
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()

    from clg_vqa_tpu.data.tokenizer import HashTokenizer, HFTokenizer

    qs = questions()
    arms = [("hash (FNV, bench default)", HashTokenizer())]
    tiny = os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                        "fixtures", "tiny_xlmr_tok")
    if os.path.isdir(tiny):
        arms.append(("tiny 400-piece Unigram fixture", HFTokenizer(tiny)))
    if os.path.isdir(args.tok_dir):
        arms.append((f"FULL 250k-piece Unigram ({args.tok_dir})",
                     HFTokenizer(args.tok_dir)))
    else:
        print(f"note: {args.tok_dir} missing — run "
              f"tools/make_fullsize_tokenizer.py first")

    print(f"{len(qs)} questions, encode_padded to 40, "
          f"{args.seconds:.0f}s per arm\n")
    print(f"{'tokenizer':44s} {'QA/s':>10s} {'ms/step-of-256':>15s}")
    for name, tok in arms:
        qps = bench(tok, qs, args.seconds)
        print(f"{name:44s} {qps:10.0f} {256.0 / qps * 1e3:15.2f}")


if __name__ == "__main__":
    main()
