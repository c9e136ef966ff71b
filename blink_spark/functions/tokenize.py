"""Crossencoder pair construction: deterministic token ids, context
windowing with left/right quota rebalancing, candidate representation, and
pair concat/truncate — stage 2 of the flagship lifecycle (SURVEY.md §3.1
steps 5-6), all pure JVM Column expressions (array slice arithmetic).

Reference semantics mirrored:
- context representation with quota rebalancing:
  /root/reference/blink/biencoder/data_process.py:26-69
  (left quota (L-m)/2-1, right quota the rest, unused quota flows to the
  other side; [unused0/1] mention boundary tags; [CLS]/[SEP]; zero-pad)
- candidate representation: title + [unused2] + description, truncate to
  L-2, [CLS]/[SEP], zero-pad:
  /root/reference/blink/biencoder/data_process.py:72-97
- pair construction (`modify`): context ids + candidate ids minus the
  candidate [CLS], truncate to max length:
  /root/reference/blink/crossencoder/train_cross.py:43-60
- gold-rank recording (label_id = jdx of the gold candidate, -1 if absent):
  /root/reference/blink/crossencoder/data_process.py:46-86

The WordPiece tokenizer is replaced by a deterministic, oracle-portable
whitespace tokenizer with md5-derived ids (the same id is computable in
ANSI SQL: ('0x' || substr(md5('tok:' || t), 1, 8))::BIGINT + 1000).

One deliberate deviation: the reference's Python slice `left[-quota:]`
keeps EVERYTHING when quota == 0 (the `[-0:]` quirk); here quota 0 keeps
nothing, which is the evident intent. Quotas are clamped at >= 0.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from blink_spark.functions.text import normalize_text

PAD_ID = 0
ENT_START_ID = 1  # [unused0]
ENT_END_ID = 2    # [unused1]
ENT_TITLE_ID = 3  # [unused2]
CLS_ID = 101
SEP_ID = 102
_TOKEN_ID_OFFSET = 1000  # keep hashed ids clear of the special ids


def _lit_arr(*ids: int) -> Column:
    return F.array(*[F.lit(i).cast("long") for i in ids])


def _empty_arr() -> Column:
    return F.array().cast("array<bigint>")


def token_ids(col: Column | str) -> Column:
    """array<long> of deterministic token ids over whitespace tokens of the
    normalized text. Empty/blank text → empty array."""
    toks = F.split(normalize_text(col), " ")
    nonblank = F.filter(toks, lambda t: t != "")
    return F.transform(
        nonblank,
        lambda t: F.conv(
            F.substring(F.md5(F.concat(F.lit("tok:"), t)), 1, 8), 16, 10
        ).cast("long")
        + _TOKEN_ID_OFFSET,
    )


def _pad_to(ids: Column, max_len: int) -> Column:
    return F.concat(
        ids, F.array_repeat(F.lit(PAD_ID).cast("long"),
                            F.greatest(F.lit(max_len) - F.size(ids), F.lit(0)))
    )


def context_input_ids(
    context_left: Column | str,
    mention: Column | str,
    context_right: Column | str,
    max_seq_length: int,
) -> Column:
    """[CLS] left-window [unused0] mention [unused1] right-window [SEP],
    zero-padded to max_seq_length — with the reference's quota rebalancing:
    left gets (L - m)//2 - 1, right gets the rest, and whichever side has
    spare quota donates it to the other."""
    mt0 = token_ids(mention)
    mt = F.when(
        F.size(mt0) > 0,
        F.concat(_lit_arr(ENT_START_ID), mt0, _lit_arr(ENT_END_ID)),
    ).otherwise(_empty_arr())
    lt = token_ids(context_left)
    rt = token_ids(context_right)

    m = F.size(mt)
    lq = F.floor((F.lit(max_seq_length) - m) / 2).cast("int") - 1
    rq = F.lit(max_seq_length) - m - lq - 2
    la, ra = F.size(lt), F.size(rt)
    # spare quota flows to the other side (exactly one side can overflow)
    lq2 = F.when((la > lq) & (ra <= rq), lq + (rq - ra)).otherwise(lq)
    rq2 = F.when((la <= lq) & (ra > rq), rq + (lq - la)).otherwise(rq)
    lq2 = F.greatest(lq2, F.lit(0))
    rq2 = F.greatest(rq2, F.lit(0))

    left_kept = F.when(la <= lq2, lt).otherwise(
        F.when(lq2 > 0, F.slice(lt, -lq2, lq2)).otherwise(_empty_arr())
    )
    right_kept = F.when(ra <= rq2, rt).otherwise(
        F.when(rq2 > 0, F.slice(rt, F.lit(1), rq2)).otherwise(_empty_arr())
    )
    ctx = F.concat(_lit_arr(CLS_ID), left_kept, mt, right_kept, _lit_arr(SEP_ID))
    return _pad_to(F.slice(ctx, 1, max_seq_length), max_seq_length)


def candidate_input_ids(
    title: Column | str, description: Column | str, max_seq_length: int
) -> Column:
    """[CLS] title [unused2] description [SEP], truncated to max_seq_length-2
    before the wrappers, zero-padded."""
    body = F.concat(token_ids(title), _lit_arr(ENT_TITLE_ID), token_ids(description))
    body = F.slice(body, 1, max_seq_length - 2)
    ids = F.concat(_lit_arr(CLS_ID), body, _lit_arr(SEP_ID))
    return _pad_to(ids, max_seq_length)


def pair_input_ids(
    context_ids: Column | str, candidate_ids: Column | str, max_seq_length: int
) -> Column:
    """Pair tensor row: context ids + candidate ids with the candidate [CLS]
    dropped, truncated to max_seq_length (`modify`)."""
    ctx = F.col(context_ids) if isinstance(context_ids, str) else context_ids
    cand = F.col(candidate_ids) if isinstance(candidate_ids, str) else candidate_ids
    joined = F.concat(ctx, F.slice(cand, 2, F.greatest(F.size(cand) - 1, F.lit(0))))
    return F.slice(joined, 1, max_seq_length)
