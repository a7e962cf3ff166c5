"""Linear-chain CRF (numpy): L2-regularized maximum likelihood via
forward-backward + gradient ascent, Viterbi decoding.

Fills the role of the reference's ``sklearn_crfsuite.CRF(algorithm=
"lbfgs", c1=0.1, c2=0.1)`` (/root/reference/snips_nlu/slot_filler/
crf_slot_filler.py:101-162, config pipeline/configs/slot_filler.py:145).
Differences: plain gradient ascent with fixed iteration count instead of
L-BFGS, L2 only (no L1) — chosen for determinism (BASELINE.md quality
gates are the acceptance criterion, not weight-level parity).

Token features are dicts {name: value}; each (name, value) pair becomes
one indicator feature.
"""

from __future__ import annotations

import numpy as np


def _logsumexp(a: np.ndarray, axis: int | None = None) -> np.ndarray:
    m = np.max(a, axis=axis, keepdims=True)
    out = np.log(np.sum(np.exp(a - m), axis=axis, keepdims=True)) + m
    return out if axis is None else np.squeeze(out, axis=axis)


_KV_MISS = object()


class LinearChainCRF:
    def __init__(self, c2: float = 0.1, n_iter: int = 120,
                 learning_rate: float = 0.5) -> None:
        self.c2 = c2
        self.n_iter = n_iter
        self.learning_rate = learning_rate
        self.labels: list[str] = []
        self.feature_index: dict[str, int] = {}
        self._kv_cache: dict = {}  # (name, value) -> feature id or None
        # (base name, offset, value) -> feature id or None; owned here
        # because ids are only meaningful against THIS feature_index
        # (filled by FeatureSet.compute_ids on the inference fast path)
        self._id_memo: dict = {}
        self.emission: np.ndarray | None = None    # F × L
        self.transition: np.ndarray | None = None  # L × L
        self.bos: np.ndarray | None = None         # L (start scores)

    # -------------------------------------------------------------- helpers
    @staticmethod
    def _feat_keys(token_features: dict) -> list[str]:
        return [f"{k}={v}" for k, v in token_features.items()]

    def _emit_scores(self, seq_feats: list[dict]) -> np.ndarray:
        """T × L emission score matrix for a sequence — one vectorized
        gather-scatter instead of a numpy row-add per feature (the
        row-add variant dominated the cold-path profile)."""
        scores = np.zeros((len(seq_feats), len(self.labels)))
        index = self.feature_index
        f_ids: list[int] = []
        f_tok: list[int] = []
        for t, feats in enumerate(seq_feats):
            for k, v in feats.items():
                j = index.get(f"{k}={v}")
                if j is not None:
                    f_ids.append(j)
                    f_tok.append(t)
        if f_ids:
            np.add.at(scores, np.array(f_tok, dtype=np.int64),
                      self.emission[np.array(f_ids, dtype=np.int64)])
        return scores

    # ------------------------------------------------------------------ fit
    def fit(self, sequences: list[list[dict]], tag_sequences: list[list[str]]
            ) -> "LinearChainCRF":
        labels = sorted({t for tags in tag_sequences for t in tags})
        # 'O' first for readability/debugging stability
        if "O" in labels:
            labels.remove("O")
            labels = ["O"] + labels
        self.labels = labels
        lab_idx = {t: i for i, t in enumerate(labels)}
        n_labels = len(labels)

        feature_index: dict[str, int] = {}
        # flat per-sequence arrays: (feature ids, owning token positions)
        seq_data: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        for seq, tags in zip(sequences, tag_sequences):
            f_ids: list[int] = []
            f_tok: list[int] = []
            for t, feats in enumerate(seq):
                for key in self._feat_keys(feats):
                    j = feature_index.setdefault(key, len(feature_index))
                    f_ids.append(j)
                    f_tok.append(t)
            seq_data.append((np.array(f_ids, dtype=np.int64),
                             np.array(f_tok, dtype=np.int64),
                             np.array([lab_idx[t] for t in tags],
                                      dtype=np.int64)))
        self.feature_index = feature_index
        self._kv_cache = {}
        self._id_memo = {}
        n_feats = len(feature_index)

        em = np.zeros((n_feats, n_labels))
        tr = np.zeros((n_labels, n_labels))
        bos = np.zeros(n_labels)

        lr = self.learning_rate
        n_seq = len(sequences)
        for _ in range(self.n_iter):
            g_em = np.zeros_like(em)
            g_tr = np.zeros_like(tr)
            g_bos = np.zeros_like(bos)
            for f_ids, f_tok, ys in seq_data:
                t_len = len(ys)
                if t_len == 0:
                    continue
                emit = np.zeros((t_len, n_labels))
                np.add.at(emit, f_tok, em[f_ids])
                # forward
                alpha = np.zeros((t_len, n_labels))
                alpha[0] = bos + emit[0]
                for t in range(1, t_len):
                    alpha[t] = emit[t] + _logsumexp(
                        alpha[t - 1][:, None] + tr, axis=0)
                # backward
                beta = np.zeros((t_len, n_labels))
                for t in range(t_len - 2, -1, -1):
                    beta[t] = _logsumexp(
                        tr + emit[t + 1] + beta[t + 1], axis=1)
                log_z = _logsumexp(alpha[-1])
                node_marg = np.exp(alpha + beta - log_z)  # T × L
                # gradients: observed - expected
                np.add.at(g_em, (f_ids, ys[f_tok]), 1.0)
                np.add.at(g_em, f_ids, -node_marg[f_tok])
                g_bos[ys[0]] += 1.0
                g_bos -= node_marg[0]
                # pairwise marginals, all t at once: (T-1) × L × L
                pair = (alpha[:-1, :, None] + tr[None, :, :]
                        + (emit[1:] + beta[1:])[:, None, :]) - log_z
                g_tr -= np.exp(pair).sum(axis=0)
                np.add.at(g_tr, (ys[:-1], ys[1:]), 1.0)
            scale = lr / n_seq
            em += scale * (g_em - self.c2 * em * n_seq / 100.0)
            tr += scale * (g_tr - self.c2 * tr * n_seq / 100.0)
            bos += scale * (g_bos - self.c2 * bos * n_seq / 100.0)

        self.emission, self.transition, self.bos = em, tr, bos
        return self

    # ---------------------------------------------------------------- decode
    def predict_single(self, seq_feats: list[dict]) -> list[str]:
        if not seq_feats or not self.labels:
            return []
        emit = self._emit_scores(seq_feats)
        t_len, n_labels = emit.shape
        delta = self.bos + emit[0]
        back = np.zeros((t_len, n_labels), dtype=np.int64)
        for t in range(1, t_len):
            scores = delta[:, None] + self.transition
            back[t] = np.argmax(scores, axis=0)
            delta = emit[t] + np.max(scores, axis=0)
        path = [int(np.argmax(delta))]
        for t in range(t_len - 1, 0, -1):
            path.append(int(back[t, path[-1]]))
        return [self.labels[i] for i in reversed(path)]

    def predict_batch(self, seqs: list[list[dict]]) -> list[list[str]]:
        """Batched Viterbi: one padded (B, T, L) emission gather and T
        vectorized DP steps instead of per-sequence numpy calls. Row i is
        float-identical to ``predict_single(seqs[i])`` (same accumulation
        order per (row, token); same first-max argmax tie-breaking)."""
        if not seqs or not self.labels:
            return [[] for _ in seqs]
        n_labels = len(self.labels)
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        t_max = int(lens.max())
        n_seq = len(seqs)
        if t_max == 0:
            return [[] for _ in seqs]

        index = self.feature_index
        # (name, value) → id-or-None memo: feature values repeat heavily
        # across tokens/rows (shapes, is_first, cluster ids, common
        # ngrams), so most lookups skip the f-string format + hash
        kv_cache = self._kv_cache
        if len(kv_cache) > 200_000:
            kv_cache.clear()
        miss = _KV_MISS
        f_ids: list[int] = []
        f_row: list[int] = []
        f_tok: list[int] = []
        for b, seq in enumerate(seqs):
            for t, feats in enumerate(seq):
                for kv in feats.items():
                    j = kv_cache.get(kv, miss)
                    if j is miss:
                        j = index.get(f"{kv[0]}={kv[1]}")
                        kv_cache[kv] = j
                    if j is not None:
                        f_ids.append(j)
                        f_row.append(b)
                        f_tok.append(t)
        emit = np.zeros((n_seq, t_max, n_labels))
        if f_ids:
            np.add.at(emit,
                      (np.array(f_row, dtype=np.int64),
                       np.array(f_tok, dtype=np.int64)),
                      self.emission[np.array(f_ids, dtype=np.int64)])
        return self._viterbi_padded(emit, lens)

    def predict_batch_ids(self, seqs: list[list[list[int]]]
                          ) -> list[list[str]]:
        """Batched Viterbi over precomputed per-token feature-id lists
        (FeatureSet.compute_ids) — skips the per-token dict iteration and
        string-key lookups of ``predict_batch`` entirely. Emission
        accumulation uses the same np.add.at gather, so rows are
        float-identical to the dict path on equal feature content."""
        if not seqs or not self.labels:
            return [[] for _ in seqs]
        n_labels = len(self.labels)
        lens = np.array([len(s) for s in seqs], dtype=np.int64)
        t_max = int(lens.max()) if len(lens) else 0
        n_seq = len(seqs)
        if t_max == 0:
            return [[] for _ in seqs]

        counts = np.empty(int(lens.sum()), dtype=np.int64)
        flat_ids: list[int] = []
        k = 0
        for seq in seqs:
            for ids in seq:
                counts[k] = len(ids)
                k += 1
                flat_ids.extend(ids)
        emit = np.zeros((n_seq, t_max, n_labels))
        if flat_ids:
            row_of_tok = np.repeat(np.arange(n_seq, dtype=np.int64), lens)
            tok_pos = np.concatenate(
                [np.arange(n, dtype=np.int64) for n in lens])
            f_row = np.repeat(row_of_tok, counts)
            f_tok = np.repeat(tok_pos, counts)
            np.add.at(emit, (f_row, f_tok),
                      self.emission[np.array(flat_ids, dtype=np.int64)])
        return self._viterbi_padded(emit, lens)

    def _viterbi_padded(self, emit: np.ndarray, lens: np.ndarray
                        ) -> list[list[str]]:
        """Shared (B, T, L) Viterbi DP + per-row backtrace; rows beyond
        their length are frozen so padding never affects the path."""
        n_seq, t_max, _ = emit.shape
        delta = self.bos + emit[:, 0, :]                       # (B, L)
        back = np.zeros(emit.shape, dtype=np.int64)
        for t in range(1, t_max):
            scores = delta[:, :, None] + self.transition[None, :, :]
            back[:, t, :] = np.argmax(scores, axis=1)
            new_delta = emit[:, t, :] + np.max(scores, axis=1)
            active = (t < lens)[:, None]
            delta = np.where(active, new_delta, delta)  # freeze done rows

        out: list[list[str]] = []
        for b in range(n_seq):
            t_len = int(lens[b])
            if t_len == 0:
                out.append([])
                continue
            path = [int(np.argmax(delta[b]))]
            for t in range(t_len - 1, 0, -1):
                path.append(int(back[b, t, path[-1]]))
            out.append([self.labels[i] for i in reversed(path)])
        return out

    def sequence_log_proba(self, seq_feats: list[dict],
                           tags: list[str]) -> float:
        """log p(tags | tokens) — forward algorithm (ref:
        crf_slot_filler.py:215-244, used for debugging checks)."""
        emit = self._emit_scores(seq_feats)
        lab_idx = {t: i for i, t in enumerate(self.labels)}
        ys = [lab_idx[t] for t in tags]
        score = self.bos[ys[0]] + emit[0, ys[0]]
        for t in range(1, len(ys)):
            score += self.transition[ys[t - 1], ys[t]] + emit[t, ys[t]]
        alpha = self.bos + emit[0]
        for t in range(1, len(seq_feats)):
            alpha = emit[t] + _logsumexp(alpha[:, None] + self.transition,
                                         axis=0)
        return float(np.asarray(score - _logsumexp(alpha)).reshape(-1)[0])

    # ----------------------------------------------------------------- io
    def to_dict(self) -> dict:
        return {"c2": self.c2, "n_iter": self.n_iter,
                "learning_rate": self.learning_rate,
                "labels": self.labels,
                "feature_index": self.feature_index,
                "emission": self.emission.tolist(),
                "transition": self.transition.tolist(),
                "bos": self.bos.tolist()}

    @classmethod
    def from_dict(cls, d: dict) -> "LinearChainCRF":
        m = cls(c2=d["c2"], n_iter=d["n_iter"],
                learning_rate=d["learning_rate"])
        m.labels = list(d["labels"])
        m.feature_index = dict(d["feature_index"])
        m.emission = np.array(d["emission"])
        m.transition = np.array(d["transition"])
        m.bos = np.array(d["bos"])
        return m
