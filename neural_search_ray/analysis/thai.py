"""Thai dictionary segmentation: greedy maximal matching over a word list.

The reference delegates Thai to Lucene's ThaiTokenizer, which wraps an ICU
dictionary BreakIterator (analysis/.../ThaiTokenizer — dictionary data ships
with ICU, not with this container). The MECHANISM here is the standard
maximal-matching segmenter (greedy longest dictionary prefix, unknown spans
accumulated until the next known word — the classic Thai word-segmentation
baseline, cf. pythainlp's `newmm` ancestry): real, deterministic, and tested;
the DATA is a small embedded starter lexicon of common Thai words, extensible
at runtime with ``ThaiSegmenter(words=...)`` or ``add_words`` (e.g. from a
full public wordlist on a real deployment).
"""

from __future__ import annotations

import re
from collections.abc import Iterable

_THAI_RUN_RE = re.compile(r"^[฀-๿]+$")

# Common-word starter lexicon (function words + everyday nouns/verbs).
# A production deployment extends this with a full public dictionary.
_STARTER_LEXICON = [
    "สวัสดี", "ขอบคุณ", "ครับ", "ค่ะ", "คะ",
    "ประเทศไทย", "ประเทศ", "ไทย", "ภาษา",
    "คน", "ใคร", "อะไร", "ที่ไหน", "ทำไม", "อย่างไร",
    "กิน", "ข้าว", "น้ำ", "อาหาร",
    "หนังสือ", "โรงเรียน", "เรียน", "ครู", "นักเรียน",
    "แมว", "หมา", "นก", "ปลา", "ช้าง",
    "รัก", "ชอบ", "คิด", "รู้", "เห็น", "ฟัง", "พูด", "อ่าน", "เขียน",
    "บ้าน", "เมือง", "ถนน", "รถ", "เรือ",
    "ใหญ่", "เล็ก", "ดี", "ไม่ดี", "สวย", "เร็ว", "ช้า",
    "ไม่", "มี", "เป็น", "อยู่", "ไป", "มา", "ทำ", "ได้", "จะ", "แล้ว",
    "และ", "หรือ", "แต่", "กับ", "ของ", "ใน", "บน", "ที่", "นี้", "นั้น",
    "งาน", "เงิน", "วัน", "คืน", "ปี", "เดือน", "เวลา", "วันนี้", "พรุ่งนี้",
    "หนึ่ง", "สอง", "สาม", "สี่", "ห้า", "หก", "เจ็ด", "แปด", "เก้า", "สิบ",
    "ผม", "ฉัน", "คุณ", "เขา", "เรา", "มัน",
    "มาก", "น้อย", "ทุก", "บาง", "ใจ", "หัว", "มือ", "ตา",
]


class ThaiSegmenter:
    """Greedy maximal-matching segmenter. O(run_len · max_word_len)."""

    def __init__(self, words: Iterable[str] | None = None):
        self._words: set[str] = set(_STARTER_LEXICON)
        if words:
            self._words.update(words)
        self._maxlen = max(map(len, self._words))
        # prefix set: lets the unknown-span scan stop at the first
        # position where ANY dictionary word could start
        self._starts: set[str] = {w[0] for w in self._words}

    def add_words(self, words: Iterable[str]) -> None:
        ws = list(words)
        self._words.update(ws)
        if ws:
            self._maxlen = max(self._maxlen, max(map(len, ws)))
            self._starts.update(w[0] for w in ws)

    def segment(self, run: str) -> list[str]:
        """Split one Thai run into words. Unknown characters accumulate
        into a single token until a known word (or end of run) starts."""
        out: list[str] = []
        i, n = 0, len(run)
        unk_start = -1
        while i < n:
            match = None
            if run[i] in self._starts:
                for ln in range(min(self._maxlen, n - i), 0, -1):
                    cand = run[i : i + ln]
                    if cand in self._words:
                        match = cand
                        break
            if match is None:
                if unk_start < 0:
                    unk_start = i
                i += 1
                continue
            if unk_start >= 0:
                out.append(run[unk_start:i])
                unk_start = -1
            out.append(match)
            i += len(match)
        if unk_start >= 0:
            out.append(run[unk_start:])
        return out


DEFAULT_SEGMENTER = ThaiSegmenter()
