"""Sources and sinks (reference §2.1 S1–S8)."""

from relex_spark.sources.readers import (  # noqa: F401
    read_semeval_jsonl,
    read_tacred_json,
    semeval_to_candidates,
    tacred_to_candidates,
)
from relex_spark.sources.transcripts import (  # noqa: F401
    TRANSCRIPT_SCHEMA,
    read_transcripts,
    synthesize_transcripts,
)
from relex_spark.sources.sinks import (  # noqa: F401
    write_id_label_tsv,
    write_stage,
    read_stage,
    stage_is_complete,
)
