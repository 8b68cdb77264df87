from .manifest import (  # noqa: F401
    commit_partition,
    load_manifests,
    partition_input_fingerprint,
    pending_partitions,
    validate_resume_config,
)
