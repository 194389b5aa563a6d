"""Golden-output stability lock.

The golden oracle is produced by the same pure functions the pipeline calls
(FIXTURES.md §2), so a semantic regression in extraction/validation would
silently update both sides. This checksum pins the exact bytes of the
200-row golden corpus: any change to extraction semantics must consciously
update the hash below (and the change should be explained in the commit).
"""

import hashlib

# sha256 over sorted (url, extracted_text) pairs of generate_pages(200, 42).
# History:
#   1b3e0f32… — initial corpus
#   52cca7cf… — fixtures enriched with inline markup/entities/comments
#               (semantic change: entity decoding now exercised; golden
#               texts may contain '&' etc.)
#   195b13cb… — doc 58/158 became a two-column PDF (column-major reading
#               order now exercised)
GOLDEN_SHA256 = "195b13cbb99e635eb83ececf49118fba1f61e6a9a3208fd7c85e05b15ea81d20"


def test_golden_corpus_checksum(small_pages, golden_small):
    h = hashlib.sha256()
    for url in sorted(golden_small):
        h.update(url.encode())
        h.update(b"\x00")
        h.update(golden_small[url].encode())
        h.update(b"\x01")
    assert h.hexdigest() == GOLDEN_SHA256, (
        "golden extraction output changed — if intentional, update "
        "GOLDEN_SHA256 and document the semantic change"
    )
