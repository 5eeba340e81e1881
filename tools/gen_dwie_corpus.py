#!/usr/bin/env python3
"""Seeded generator for the DWIE-shaped gate corpus.

DWIE docs (GLRE+KIRE/data_processing/dwieProcess.py:64-70) are DocRED-shaped
plus a per-mention `absolute_pos` [abs_start, abs_end) in document token
space — the field the engine's DWIE scan path consumes. This reuses the
DocRED generator's vertex/mention/label machinery (same dictionary mirror,
vote noise, link overrides) and adds the absolute positions as prefix-sum
offsets over the sentence lengths, exactly the W8 invariant.

Writes src/test/resources/dwie_corpus.jsonl (60 docs, titles DW_###). The
reference-prediction fixtures over it are produced by
`sbt "runMain graft.tools.GenRefPredictions"`.
"""
import json
import random

import gen_docred_corpus as g

OUT_JSONL = "src/test/resources/dwie_corpus.jsonl"


def add_absolute_pos(doc):
    offs = [0]
    for sent in doc["sents"]:
        offs.append(offs[-1] + len(sent))
    for vertex in doc["vertexSet"]:
        for m in vertex:
            base = offs[m["sent_id"]]
            m["absolute_pos"] = [base + m["pos"][0], base + m["pos"][1]]
    return doc


def main():
    rng = random.Random(4242)
    docs = [add_absolute_pos(g.gen_doc(rng, "DW_%03d" % i))
            for i in range(60)]
    with open(OUT_JSONL, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    n_m = sum(len(v) for d in docs for v in d["vertexSet"])
    n_l = sum(len(d["labels"]) for d in docs)
    print("docs=%d mentions=%d labels=%d" % (len(docs), n_m, n_l))


if __name__ == "__main__":
    main()
