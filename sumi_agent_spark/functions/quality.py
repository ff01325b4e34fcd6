"""Quality-filter scoring: language-ID, n-gram perplexity, heuristics.

North-rule additions beyond the reference (SURVEY.md §2.8): a fastText-style
character-n-gram language gate (ja/en), a KenLM-style char-bigram negative
log-likelihood score, and heuristic keep/drop rules grounded in the
reference's own quality machinery:

* ``too_short``  -- <30 non-whitespace chars, the sparse-page rule
  (/root/reference/src/app/RedactPro.tsx:1102-1103) applied per turn.
* ``mojibake``   -- U+FFFD replacement chars or a high Latin-1-supplement
  ratio, the CMap-failure / garbled-text detector analog
  (/root/reference/src/app/RedactPro.tsx:1108-1118).
* ``repetition`` -- low distinct-trigram ratio (spam / stuck generations).
* ``symbol_ratio`` -- mostly punctuation/symbols.
* ``perplexity`` -- char-bigram NLL above threshold under the detected
  language's model.

Everything is vectorized numpy over whole Arrow batches: texts are
concatenated once into a single uint32 codepoint array; per-row statistics
come from cumulative sums sliced at row offsets.  No per-row Python in the
hot path.  Models are built deterministically at import time from small
corpora embedded below -- no external data, no RNG.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

# ─── Embedded training corpora (deterministic, original text) ───

_JA_CORPUS = (
    "データ処理の基盤を構築するためには、分散システムの設計原則を理解することが重要です。"
    "本日の会議では、新しい機能の実装方針について話し合いました。"
    "お問い合わせいただきありがとうございます。担当者より折り返しご連絡いたします。"
    "この文章は日本語の文字頻度を学習するための埋め込みコーパスです。"
    "東京では桜が満開になり、多くの人々が公園を訪れています。"
    "機械学習モデルの精度を向上させるには、質の高い学習データが不可欠です。"
    "申し訳ございませんが、もう一度詳細を教えていただけますでしょうか。"
    "それでは、次の議題に移りたいと思います。資料をご覧ください。"
    "昨日は雨が降っていましたが、今日は晴れて気持ちの良い天気です。"
    "プログラムの実行結果を確認したところ、期待通りの出力が得られました。"
    "健康のために毎朝三十分ほど散歩をするように心がけています。"
    "新しい技術を学ぶことは大変ですが、とても楽しいことでもあります。"
    "会社の近くに美味しいラーメン屋があるので、今度一緒に行きましょう。"
    "了解しました。ログを確認してから、改めてご連絡いたしますので少々お待ちください。"
    "お世話になっております。先日の件につきまして、資料を添付いたしますのでご確認のほどよろしくお願いいたします。"
    "来週の打ち合わせの日程を調整したいのですが、ご都合のよい時間帯を教えていただけますか。"
    "障害の原因を調査した結果、設定ファイルの誤りによるものと判明しました。修正済みです。"
    "ご指摘いただいた点を修正し、最新版を共有フォルダに保存しました。ご確認をお願いします。"
    "この度は納期が遅れてしまい、誠に申し訳ございませんでした。今後は再発防止に努めます。"
    "売上の集計結果をまとめたレポートを作成しました。前年比で約一割の増加となっています。"
    "新入社員の研修は四月の第一週から開始する予定です。詳細は追ってお知らせします。"
    "駅から徒歩五分の場所に新しい店舗がオープンしたそうです。週末に行ってみませんか。"
    "電車が遅延しているため、会議に少し遅れて参加します。先に始めていてください。"
    "システムの保守作業のため、明日の午前二時から四時までサービスを停止いたします。"
    "彼は長年の経験を活かして、困難な問題を次々と解決していきました。"
    "環境の変化に対応するためには、継続的な学習と柔軟な発想が求められます。"
)

_EN_CORPUS = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the distant mountains. data processing systems require careful "
    "attention to partitioning and shuffle behavior at scale. thank you for "
    "your message, we will get back to you as soon as possible. this is an "
    "embedded corpus used to learn english character statistics for the "
    "language identification gate. the weather today is pleasant with a "
    "light breeze from the north. machine learning models improve when the "
    "training data is clean and well filtered. please review the attached "
    "document and let me know if you have any questions or concerns. the "
    "meeting has been rescheduled to next tuesday at three in the afternoon. "
    "distributed query engines push filters down to the storage layer to "
    "reduce the amount of data read from disk. a good benchmark measures "
    "both throughput and latency under realistic workloads. "
    "hey can you check the logs again? i think the job failed last night "
    "but i am not sure why it stopped halfway through the run. "
    "sounds good, let me know when the fix is deployed and i will verify "
    "the results on my side before we close the ticket. "
    "the function returns the doubled value of its input for downstream "
    "processing steps in the transformation chain. "
    "we should increase the network timeout setting and retry the request "
    "whenever the executor loses its heartbeat during a fetch. "
    "after reviewing the quarterly numbers the team agreed to shift budget "
    "toward infrastructure improvements and developer tooling. "
    "could you send me the updated schedule for next week? i want to make "
    "sure the review meeting does not conflict with the release window. "
    "the new model performs better on long documents because it was "
    "trained with a larger context window and cleaner labels. "
    "installation is straightforward: download the package, run the setup "
    "script, and restart the service when prompted. "
    "there was a small typo in the configuration file which caused the "
    "whole deployment to fail silently over the weekend. "
    "in general you should prefer built in functions over custom code "
    "because they are faster and easier to maintain over time."
)

_OTHER_CORPUS = (
    "le renard brun rapide saute par dessus le chien paresseux pendant que "
    "le soleil se couche lentement derriere les montagnes lointaines. "
    "bonjour pouvez vous verifier les journaux encore une fois je pense que "
    "le travail a echoue la nuit derniere mais je ne suis pas certain. "
    "merci beaucoup pour votre message nous vous repondrons des que possible "
    "avec les informations demandees sur votre dossier. "
    "der schnelle braune fuchs springt ueber den faulen hund waehrend die "
    "sonne langsam hinter den bergen untergeht. es freut mich sehr sie "
    "kennenzulernen und ich hoffe wir sehen uns bald wieder. "
    "hallo koennen sie bitte die protokolle noch einmal pruefen ich glaube "
    "der auftrag ist letzte nacht fehlgeschlagen aber ich bin nicht sicher. "
    "vielen dank fuer ihre nachricht wir melden uns so schnell wie moeglich "
    "mit den gewuenschten informationen zu ihrem anliegen. "
    "el rapido zorro marron salta sobre el perro perezoso mientras el sol "
    "se pone lentamente detras de las montanas lejanas. muchas gracias por "
    "su mensaje le responderemos lo antes posible. "
    "hola puedes revisar los registros otra vez creo que el trabajo fallo "
    "anoche pero no estoy seguro de la causa del problema. "
    "la volpe marrone veloce salta sopra il cane pigro mentre il sole "
    "tramonta lentamente dietro le montagne lontane. grazie mille per il "
    "vostro messaggio vi risponderemo al piu presto possibile. "
    "buongiorno potete controllare di nuovo i registri penso che il lavoro "
    "sia fallito la scorsa notte ma non ne sono sicuro."
)

# Stopword gates for en-vs-other discrimination (word-boundary matches on
# lowercased text).  Deterministic, language-characteristic function words.
_EN_STOPWORDS = (
    "the and of to is in that for with was you we this have be are on it as "
    "at by from or an will not but they can should would could when what"
).split()
_OTHER_STOPWORDS = (
    "le la les des du et est une que pour dans vous je ne pas der die das "
    "und ist nicht mit von sie ich el los las por con para una es no di il "
    "che per non sono mi"
).split()


class _NgramModel:
    """Interpolated char trigram/bigram/unigram model, numpy-queryable.

    KenLM-style in spirit: P = l3*P3 + l2*P2 + l1*P1 with add-k smoothing
    per order.  All probability tables are sorted-key arrays queried with
    ``np.searchsorted`` so scoring a whole Arrow batch is a handful of
    vectorized passes.
    """

    __slots__ = ("vocab", "V", "tri_keys", "tri_p", "bi_keys", "bi_p",
                 "uni_p", "add_k")

    L3, L2, L1 = 0.65, 0.25, 0.10

    def __init__(self, corpus: str, add_k: float = 0.2):
        cps = np.frombuffer(corpus.encode("utf-32-le"), dtype=np.uint32)
        vocab = np.unique(cps)
        self.vocab = vocab
        self.add_k = add_k
        self.V = V = len(vocab) + 1  # +1 unk id = V-1
        ids = np.searchsorted(vocab, cps).astype(np.int64)

        bi = ids[:-1] * V + ids[1:]
        bk, bc = np.unique(bi, return_counts=True)
        ctx1 = np.zeros(V)
        np.add.at(ctx1, bk // V, bc)
        self.bi_keys = bk
        self.bi_p = (bc + add_k) / (ctx1[bk // V] + add_k * V)

        tri = (ids[:-2] * V + ids[1:-1]) * V + ids[2:]
        tk, tc = np.unique(tri, return_counts=True)
        bctx = tk // V
        ctx2_tot = np.zeros(len(bk))
        bpos = np.searchsorted(bk, bctx)
        np.add.at(ctx2_tot, bpos, tc)
        self.tri_keys = tk
        self.tri_p = (tc + add_k) / (ctx2_tot[bpos] + add_k * V)

        uid, uc = np.unique(ids, return_counts=True)
        uni = np.full(V, add_k)
        uni[uid] += uc
        self.uni_p = uni / uni.sum()

    def _lookup(self, keys: np.ndarray, table_keys: np.ndarray,
                table_p: np.ndarray, floor: float) -> np.ndarray:
        if len(table_keys) == 0:
            return np.full(len(keys), floor)
        pos = np.minimum(np.searchsorted(table_keys, keys), len(table_keys) - 1)
        return np.where(table_keys[pos] == keys, table_p[pos], floor)

    def char_ids(self, cps: np.ndarray) -> np.ndarray:
        idx = np.minimum(np.searchsorted(self.vocab, cps), len(self.vocab) - 1)
        return np.where(self.vocab[idx] == cps, idx, self.V - 1)

    def nll(self, cps: np.ndarray, row_break: np.ndarray) -> np.ndarray:
        """Per-position NLL (len N-1, for positions 1..N-1 of the concat);
        positions crossing row boundaries are zeroed by ``row_break``."""
        if len(cps) < 2:
            return np.zeros(max(len(cps) - 1, 0))
        ids = self.char_ids(cps)
        V = self.V
        floor2 = self.add_k / (self.add_k * V)
        bi = ids[:-1] * V + ids[1:]
        p2 = self._lookup(bi, self.bi_keys, self.bi_p, floor2)
        p1 = self.uni_p[ids[1:]]
        if len(ids) >= 3:
            tri = (ids[:-2] * V + ids[1:-1]) * V + ids[2:]
            p3 = np.concatenate([[floor2],
                                 self._lookup(tri, self.tri_keys, self.tri_p,
                                              floor2)])
            # a trigram spanning a row break is invalid: degrade to bigram
            prev_break = np.concatenate([[True], row_break[:-1]])
            p3 = np.where(prev_break, p2, p3)
        else:
            p3 = p2
        p = self.L3 * p3 + self.L2 * p2 + self.L1 * p1
        nll = -np.log(p)
        nll[row_break] = 0.0
        return nll


_MODEL_JA = _NgramModel(_JA_CORPUS)
_MODEL_EN = _NgramModel(_EN_CORPUS)
_MODEL_OTHER = _NgramModel(_OTHER_CORPUS)

import re as _re

_EN_SW_RE = _re.compile(r"\b(?:" + "|".join(_EN_STOPWORDS) + r")\b")
_OTHER_SW_RE = _re.compile(r"\b(?:" + "|".join(_OTHER_STOPWORDS) + r")\b")


@dataclass(frozen=True)
class QualityConfig:
    """Thresholds for the keep/drop decision.  All deterministic."""

    min_chars: int = 30                 # non-whitespace chars (sparse-page rule)
    mojibake_latin1_ratio: float = 0.30
    rep_distinct_ratio: float = 0.25    # distinct trigrams / total trigrams
    rep_min_trigrams: int = 30
    symbol_ratio_max: float = 0.50
    # interpolated char-trigram NLL ceilings (nats/char); JA text carries a
    # higher baseline because of its open character vocabulary
    nll_max_ja: float = 6.5
    nll_max_en: float = 3.0
    langs_kept: frozenset[str] = frozenset({"ja", "en"})
    ja_char_ratio: float = 0.30         # kana+kanji share => ja
    latin_ratio: float = 0.50           # latin share => en/other scorer
    zh_guard_min_chars: int = 60        # kana-less kanji text this long => zh
    # role whose turns skip the lang/symbol/perplexity gates -- structured
    # tool output is code-shaped, not natural language
    exempt_role: Optional[str] = "tool"


DEFAULT_QUALITY_CONFIG = QualityConfig()

DROP_REASONS = ["", "lang", "too_short", "mojibake", "repetition",
                "symbol_ratio", "perplexity"]


def _seg_sum(values: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    csum = np.concatenate([[0.0], np.cumsum(values)])
    return csum[ends] - csum[starts]


def _subset_nll(model: _NgramModel, t: pd.Series, lens: np.ndarray,
                mask: np.ndarray, lowercase: bool) -> np.ndarray:
    """Per-row mean bigram NLL under ``model``, computed ONLY for rows in
    ``mask`` (zeros elsewhere).

    The models are strictly intra-row (cross-row positions are zeroed and
    trigrams spanning a row boundary degrade to bigrams), so scoring a
    sub-concatenation of just the masked rows is byte-identical to scoring
    the full batch and discarding the rest -- while skipping, e.g., the EN
    and OTHER table lookups for every Japanese row."""
    n = len(t)
    out = np.zeros(n)
    if not mask.any():
        return out
    sub_texts = t[mask].tolist()
    if lowercase:
        # Per ROW, never per batch: .lower() can change a string's length
        # (e.g. U+0130 -> "i" + combining dot), and a batch-global fallback
        # would make every sibling row's score depend on which rows share
        # its Arrow batch (partition-dependent output).  A row whose own
        # lower() changes length keeps its original text, so offsets from
        # ``lens`` stay aligned for every row.
        sub_texts = [low if len(low := s.lower()) == len(s) else s
                     for s in sub_texts]
    sub_joined = "".join(sub_texts)
    cps = np.frombuffer(sub_joined.encode("utf-32-le"), dtype=np.uint32)
    sub_lens = lens[mask]
    ends = np.cumsum(sub_lens)
    starts = ends - sub_lens
    row_break = np.zeros(max(len(cps) - 1, 0), dtype=bool)
    inner_ends = ends[:-1]
    row_break[inner_ends[(inner_ends > 0) & (inner_ends < len(cps))] - 1] = True
    pos_nll = model.nll(cps, row_break)
    if not len(pos_nll):
        return out
    n_pos = max(len(cps) - 1, 0)
    ps = np.minimum(starts, n_pos)
    pe = np.minimum(np.maximum(ends - 1, starts), n_pos)
    safe_bi = np.maximum(sub_lens - 1, 1).astype(np.float64)
    out[mask] = _seg_sum(pos_nll, ps, pe) / safe_bi
    return out


def quality_frame(
    texts: pd.Series,
    roles: Optional[pd.Series] = None,
    cfg: QualityConfig = DEFAULT_QUALITY_CONFIG,
) -> pd.DataFrame:
    """Vectorized quality scores + keep/drop for a batch of turn texts.

    Returns a DataFrame aligned to ``texts.index`` with columns:
    lang, nll, n_chars, symbol_ratio, distinct_trigram_ratio, mojibake,
    keep, drop_reason.
    """
    t = texts.fillna("").astype(str)
    n = len(t)
    if n == 0:
        return pd.DataFrame({
            "lang": pd.Series([], dtype=str), "nll": [], "n_chars": [],
            "symbol_ratio": [], "distinct_trigram_ratio": [], "mojibake": [],
            "keep": [], "drop_reason": []})

    joined = "".join(t.tolist())
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
    lens = t.str.len().to_numpy(dtype=np.int64)
    ends = np.cumsum(lens)
    starts = ends - lens

    # ── char classes ──
    is_ws = ((cps == 0x20) | (cps == 0x09) | (cps == 0x0A) | (cps == 0x0D)
             | (cps == 0x3000))
    is_digit = (cps >= 0x30) & (cps <= 0x39)
    is_latin = ((cps >= 0x41) & (cps <= 0x5A)) | ((cps >= 0x61) & (cps <= 0x7A))
    is_kana = (cps >= 0x3040) & (cps <= 0x30FF)
    is_kanji = (cps >= 0x4E00) & (cps <= 0x9FFF)
    is_latin1_sup = (cps >= 0x80) & (cps <= 0xFF)
    is_fffd = cps == 0xFFFD
    is_word = is_digit | is_latin | is_kana | is_kanji

    non_ws = _seg_sum(~is_ws, starts, ends)
    n_digit = _seg_sum(is_digit, starts, ends)
    n_latin = _seg_sum(is_latin, starts, ends)
    n_kana = _seg_sum(is_kana, starts, ends)
    n_kanji = _seg_sum(is_kanji, starts, ends)
    n_l1 = _seg_sum(is_latin1_sup, starts, ends)
    n_fffd = _seg_sum(is_fffd, starts, ends)
    n_word = _seg_sum(is_word, starts, ends)

    safe_nonws = np.maximum(non_ws, 1)
    alpha = np.maximum(n_latin + n_kana + n_kanji, 1)  # letters only
    ja_ratio = (n_kana + n_kanji) / alpha
    latin_ratio = n_latin / alpha
    symbol_ratio = (non_ws - n_word) / safe_nonws
    has_letters = (n_latin + n_kana + n_kanji) > 0

    # ── language-ID masks from character-class ratios (no NLL needed) ──
    lang = np.full(n, "other", dtype=object)
    lang[~has_letters] = "unknown"
    latin_dom = has_letters & (ja_ratio < cfg.ja_char_ratio) & \
        (latin_ratio >= cfg.latin_ratio)
    # zh guard: long kanji-dominant text with ZERO kana is Chinese, not
    # Japanese (real Japanese prose always carries hiragana); short
    # kanji-only fragments (names, address blocks) stay ja
    ja_mask = has_letters & (ja_ratio >= cfg.ja_char_ratio) & \
        ((n_kana > 0) | (non_ws < cfg.zh_guard_min_chars))

    # en-vs-other: stopword evidence first (robust), NLL as tiebreak --
    # both computed ONLY over latin-dominant rows (subset scoring is
    # byte-identical per row; see _subset_nll)
    en_sw = np.zeros(n, dtype=np.int64)
    ot_sw = np.zeros(n, dtype=np.int64)
    if latin_dom.any():
        t_lat = t[latin_dom].str.lower()
        en_sw[latin_dom] = t_lat.str.count(_EN_SW_RE).to_numpy()
        ot_sw[latin_dom] = t_lat.str.count(_OTHER_SW_RE).to_numpy()
    nll_en = _subset_nll(_MODEL_EN, t, lens, latin_dom, lowercase=True)
    nll_ot_latin = _subset_nll(_MODEL_OTHER, t, lens, latin_dom,
                               lowercase=True)
    en_wins = (en_sw > ot_sw) | ((en_sw == ot_sw) & (nll_en <= nll_ot_latin))

    en_mask = latin_dom & en_wins
    lang[latin_dom & ~en_wins] = "other"
    lang[en_mask] = "en"
    lang[ja_mask] = "ja"

    # per-model NLL only where that model's score is consumed
    nll_ja = _subset_nll(_MODEL_JA, t, lens, ja_mask, lowercase=False)
    rest = ~ja_mask & ~latin_dom  # unknown / non-latin other -> OTHER model
    nll_ot = nll_ot_latin + _subset_nll(_MODEL_OTHER, t, lens, rest,
                                        lowercase=True)
    nll = np.where(ja_mask, nll_ja, np.where(en_mask, nll_en, nll_ot))

    # ── repetition: distinct-trigram ratio, one global sort ──
    n_tri_pos = np.maximum(lens - 2, 0).astype(np.int64)
    distinct_ratio = np.ones(n)
    if len(cps) >= 3:
        # remap codepoints to batch-vocabulary ids so the (row, trigram)
        # key packs injectively into int64 with ONE sort; huge vocabularies
        # (or huge batches) fall back to an exact two-key lexsort
        vocab = np.unique(cps)
        V = np.int64(len(vocab) + 1)
        ids = np.searchsorted(vocab, cps).astype(np.int64)
        row_of = np.repeat(np.arange(n), lens)
        valid = (row_of[:len(cps) - 2] == row_of[2:])
        rows_v = row_of[:len(cps) - 2][valid]
        if int(V) ** 3 * max(n, 1) < 2 ** 62:
            tri = ((ids[:-2] * V + ids[1:-1]) * V + ids[2:])[valid]
            combo = np.sort(rows_v * (V * V * V) + tri)
            new_unique = np.concatenate([[True], combo[1:] != combo[:-1]]) \
                if len(combo) else np.zeros(0, dtype=bool)
            uniq_rows = (combo // (V * V * V))[new_unique]
        else:
            B = np.int64(0x110000)  # injective over raw codepoints
            tris_v = ((cps[:-2].astype(np.int64) * B + cps[1:-1]) * B
                      + cps[2:])[valid]
            order = np.lexsort((tris_v, rows_v))
            r_s, t_s = rows_v[order], tris_v[order]
            new_unique = np.concatenate(
                [[True], (r_s[1:] != r_s[:-1]) | (t_s[1:] != t_s[:-1])]) \
                if len(r_s) else np.zeros(0, dtype=bool)
            uniq_rows = r_s[new_unique]
        uniq_per_row = np.bincount(uniq_rows, minlength=n)
        tot_per_row = np.bincount(rows_v, minlength=n)
        safe_tot = np.maximum(tot_per_row, 1)
        distinct_ratio = uniq_per_row / safe_tot
        # rows with NO trigrams define ratio=1.0 ALWAYS -- without this the
        # value would depend on whether the surrounding batch had >=3 chars
        # (nondeterministic under repartitioning)
        distinct_ratio[tot_per_row == 0] = 1.0
        n_tri_pos = tot_per_row

    mojibake = (n_fffd >= 1) | (n_l1 / safe_nonws >= cfg.mojibake_latin1_ratio)

    # ── keep/drop decision, reasons evaluated in fixed priority order ──
    if roles is not None:
        exempt = roles.fillna("").astype(str).to_numpy() == (cfg.exempt_role or "")
    else:
        exempt = np.zeros(n, dtype=bool)

    reason = np.full(n, "", dtype=object)
    lang_bad = ~pd.Series(lang).isin(cfg.langs_kept).to_numpy() & ~exempt
    too_short = non_ws < cfg.min_chars
    repetition = (n_tri_pos >= cfg.rep_min_trigrams) & \
        (distinct_ratio < cfg.rep_distinct_ratio)
    symbol_bad = (symbol_ratio >= cfg.symbol_ratio_max) & ~exempt
    nll_ceiling = np.where(lang == "ja", cfg.nll_max_ja, cfg.nll_max_en)
    ppl_bad = (nll > nll_ceiling) & \
        pd.Series(lang).isin(cfg.langs_kept).to_numpy() & ~exempt

    empty = non_ws == 0
    for mask, name in [
        (empty, "too_short"),
        (lang_bad, "lang"),
        (too_short, "too_short"),
        (mojibake, "mojibake"),
        (repetition, "repetition"),
        (symbol_bad, "symbol_ratio"),
        (ppl_bad, "perplexity"),
    ]:
        reason = np.where((reason == "") & mask, name, reason)

    keep = reason == ""
    return pd.DataFrame({
        "lang": lang,
        "nll": np.round(nll, 6),
        "n_chars": non_ws.astype(np.int64),
        "symbol_ratio": np.round(symbol_ratio, 6),
        "distinct_trigram_ratio": np.round(distinct_ratio, 6),
        "mojibake": mojibake,
        "keep": keep,
        "drop_reason": reason,
    }, index=texts.index)
