"""Train the byte-level BPE tokenizer on MIMIC-CXR report sections
(mirroring /root/reference/examples/tokenizer.ipynb: BPE over train-split
findings+impression, 30k vocab, specials [UNK][BOS][EOS][SEP][PAD][MASK] +
the prompt specials)."""

import argparse

from cxrmate_tpu.data.index import build_merged_index
from cxrmate_tpu.tokenizer import train_bpe


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--vocab-size", type=int, default=30000)
    args = p.parse_args()

    df = build_merged_index(args.dataset_dir)
    train = df.loc[df.split == "train"].drop_duplicates(subset=["study_id"])
    texts = train.findings.dropna().tolist() + train.impression.dropna().tolist()
    tok = train_bpe(
        texts, vocab_size=args.vocab_size,
        additional_special_tokens=["[NPF]", "[NPI]", "[PMT]", "[PMT-SEP]"],
    )
    tok.save(args.out + "/")
    print(f"saved {len(tok)}-token tokenizer to {args.out}")


if __name__ == "__main__":
    main()
