"""Generated protobuf stubs (protoc output of corpus.proto).

Regenerate with:  protoc --python_out=. corpus.proto  (run in this directory).
"""

from esrecsys_tpu.data.protos.corpus_pb2 import (  # noqa: F401
    ArxivAuthor,
    ArxivHeader,
    ArxivRecord,
    TextDocument,
    TokenStat,
    SparseDocument,
    CooccurrenceRow,
    Contributor,
    Revision,
    Page,
)
