"""Train the committed BPE merge table (snips_nlu_spark/functions/
bpe_vocab.py) on the sf0.1 documents fixture.

Standard byte-pair-encoding training (Sennrich et al. 2016, the
algorithm behind GPT-2/RoBERTa vocabularies): pretokenize with the same
regex the runtime uses, start every pretoken as a character sequence,
and repeatedly merge the most frequent adjacent symbol pair (ties
broken by lexicographically smallest pair, so training is fully
deterministic). The corpus is the driver-generated synthetic documents
table — no external data; the point is a REAL vocab-driven merge step,
not a replica of any published tokenizer.

Regenerate with: python scripts/make_bpe_vocab.py [n_merges]
"""

from __future__ import annotations

import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from snips_nlu_spark.functions.text import (BPE_SPLIT_RE,  # noqa: E402
                                             bpe_train_merges)

OUT = (Path(__file__).resolve().parent.parent
       / "snips_nlu_spark" / "functions" / "bpe_vocab.py")
CORPUS = "/root/testdata/sf0.1/documents.parquet"

# the merge loop lives in functions/text.py (bpe_train_merges) — the
# shared spec between this script, the Spark trainer and the oracle
train = bpe_train_merges


def main() -> None:
    import pandas as pd

    n_merges = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    texts = pd.read_parquet(CORPUS)["text"]
    freqs: Counter = Counter()
    pat = re.compile(BPE_SPLIT_RE)
    for t in texts:
        freqs.update(m.group(0) for m in pat.finditer(t or ""))
    merges = train(dict(freqs), n_merges)
    body = ",\n    ".join(repr(m) for m in merges)
    OUT.write_text(
        '"""BPE merge table trained by scripts/make_bpe_vocab.py on the\n'
        "sf0.1 synthetic documents fixture (deterministic: most-frequent\n"
        "pair first, ties lexicographic). Rank = list position.\n"
        "GENERATED FILE - regenerate via the script, do not hand-edit."
        '"""\n\n'
        f"MERGES: tuple = (\n    {body},\n)\n", "utf8")
    print(f"{len(merges)} merges -> {OUT}")


if __name__ == "__main__":
    main()
