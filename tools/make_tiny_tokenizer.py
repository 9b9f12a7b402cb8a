"""Generate tests/fixtures/tiny_xlmr_tok/: a miniature XLM-R-style tokenizer
loadable through ``transformers.AutoTokenizer``.

The reference tokenizes with the HF XLM-R sentencepiece tokenizer
(volta/volta/task_utils.py:468). This environment has no network and no
xlm-roberta-base snapshot, so the HF-path tests use this fixture: a Unigram
model with Metaspace pre-tokenization (the sentencepiece scheme) trained on a
small GQA-flavoured corpus, with XLM-R's exact special-token layout
(<s>=0, <pad>=1, </s>=2, <unk>=3; post-processor adds <s> ... </s>).
"""
import json
import os

from tokenizers import Tokenizer, models, normalizers, pre_tokenizers
from tokenizers import processors, trainers

OUT = os.path.join(os.path.dirname(__file__), os.pardir, "tests", "fixtures",
                   "tiny_xlmr_tok")

CORPUS = [
    "what color is the car on the left ?",
    "is there a dog near the red fire hydrant ?",
    "how many people are sitting on the bench ?",
    "the man is wearing a blue shirt and black shoes",
    "which side of the image is the white plate on ?",
    "are the curtains behind the lamp both open and yellow ?",
    "does the grass look tall or short near the fence ?",
    "what animal is standing in the water next to the boat ?",
    "is the small child holding an umbrella above her head ?",
    "the kitchen counter has apples bananas and oranges on it",
    "what kind of furniture is to the right of the television ?",
    "do you see either any mirrors or windows in this photo ?",
]


def main():
    os.makedirs(OUT, exist_ok=True)
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence([normalizers.NFKC()])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(replacement="▁")
    trainer = trainers.UnigramTrainer(
        vocab_size=400, unk_token="<unk>",
        special_tokens=["<s>", "<pad>", "</s>", "<unk>"])
    tok.train_from_iterator(CORPUS, trainer=trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>", pair="<s> $A </s> </s> $B </s>",
        special_tokens=[("<s>", tok.token_to_id("<s>")),
                        ("</s>", tok.token_to_id("</s>"))])
    assert tok.token_to_id("<s>") == 0
    assert tok.token_to_id("<pad>") == 1
    assert tok.token_to_id("</s>") == 2
    assert tok.token_to_id("<unk>") == 3
    tok.save(os.path.join(OUT, "tokenizer.json"))

    with open(os.path.join(OUT, "tokenizer_config.json"), "w") as f:
        json.dump({
            "tokenizer_class": "PreTrainedTokenizerFast",
            "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
            "pad_token": "<pad>", "model_max_length": 512,
        }, f, indent=1)
    with open(os.path.join(OUT, "special_tokens_map.json"), "w") as f:
        json.dump({"bos_token": "<s>", "eos_token": "</s>",
                   "unk_token": "<unk>", "pad_token": "<pad>"}, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
