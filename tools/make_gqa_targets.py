"""Build GQA *_target.pkl files from raw GQA question JSONs.

The reference consumes iglue-preprocessed ``{train,val,trainval}_target.pkl``
entries ({question_id, image_id, question, labels, scores}); this tool
produces the same format from GQA's balanced question dicts so the framework
is standalone:

  python tools/make_gqa_targets.py \
      --questions train_balanced_questions.json \
      --dataroot datasets/gqa/annotations --out train_target.pkl

Answers missing from trainval_ans2label.pkl are skipped (the reference's
preprocessing drops them the same way — labels come only from the fixed
1842-answer vocabulary).
"""
import argparse
import json
import os
import pickle


def build(questions: dict, ans2label: dict) -> list[dict]:
    items, skipped = [], 0
    for qid, rec in questions.items():
        ans = rec.get("answer")
        if ans is None or ans not in ans2label:
            skipped += 1
            continue
        items.append({
            "question_id": qid,
            "image_id": rec["imageId"],
            "question": rec["question"],
            "labels": [ans2label[ans]],
            "scores": [1.0],
        })
    print(f"kept {len(items)}, skipped {skipped} (answer not in vocab)")
    return items


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--questions", required=True)
    p.add_argument("--dataroot", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    with open(os.path.join(args.dataroot, "trainval_ans2label.pkl"), "rb") as f:
        ans2label = pickle.load(f)
    with open(args.questions) as f:
        questions = json.load(f)
    items = build(questions, ans2label)
    with open(args.out, "wb") as f:
        pickle.dump(items, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
