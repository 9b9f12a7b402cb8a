"""GQA exact-match scorer — parity with volta/scripts/GQA_score.py:6-20.

Predictions: list of {"questionId", "prediction"} records.
Truth: GQA-format dict {qid: {"answer": ...}}. Questions absent from the
truth dict are skipped (not counted), as in the reference.
"""
from __future__ import annotations

import json


def evaluate(preds_list: list[dict], truth_dict: dict) -> float:
    score, count = 0.0, 0
    for entry in preds_list:
        qid = str(entry["questionId"])
        rec = truth_dict.get(qid)
        if rec is None:
            continue
        if entry["prediction"] == rec["answer"]:
            score += 1.0
        count += 1
    return score / count if count else 0.0


def evaluate_files(preds_file: str, truth_file: str) -> float:
    with open(preds_file) as f:
        preds = json.load(f)
    with open(truth_file) as f:
        truth = json.load(f)
    return evaluate(preds, truth)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--preds_file", required=True)
    p.add_argument("--truth_file", required=True)
    args = p.parse_args()
    print(100 * evaluate_files(args.preds_file, args.truth_file))


if __name__ == "__main__":
    main()
