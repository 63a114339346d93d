"""Engine operators.

- ``transform``   the reference-parity cashback transform (stage → join →
                  derive → cast)
- ``repair``      data-repair utilities from the reference's legacy path
                  (coalesce-fill, donor-group fill)
- ``dedup``       exact + near-duplicate detection (hash, MinHash-LSH,
                  SimHash, n-gram Jaccard, embedding cosine)
- ``similarity``  vector similarity search (brute-force + LSH-bucketed ANN)
- ``text``        text analysis (language-ID, quality scoring, token
                  counting, fingerprinting)
- ``nested``      nested-record parsing (Python-dict blobs → structs)
- ``multimodal``  binary-column plumbing for image/audio/video payloads
"""
