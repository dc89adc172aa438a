from .alias import (
    alias_target,
    cat_indices,
    compact_to_generation,
    drop_generation,
    flip_alias,
    generation_created_at,
    generation_dir,
    init_generation,
    list_generations,
    open_alias,
    record_generation,
    resolve_index_name,
    rollover,
)
from .build import IndexBuilder
from .completion import build_completions, complete, complete_df
from .dsl import (
    aggs_dsl_df,
    compile_dsl,
    profile_dsl,
    search_dsl_df,
    search_request,
)
from .templates import (
    delete_template,
    get_template,
    list_templates,
    put_template,
    render_template,
    search_template,
)
from .incremental_index import (
    IncrementalIndexReader,
    PointInTimeReader,
    apply_incremental,
)
from .multi import MultiIndexReader
from .query import IndexReader, terms_lookup_sql, validate_query
from .rank_eval import rank_eval_df, rank_eval_metrics
from .snapshot import (
    create_snapshot,
    delete_snapshot,
    list_snapshots,
    restore_snapshot,
)

__all__ = [
    "IndexBuilder",
    "IndexReader",
    "IncrementalIndexReader",
    "MultiIndexReader",
    "PointInTimeReader",
    "apply_incremental",
    "alias_target",
    "compact_to_generation",
    "create_snapshot",
    "delete_snapshot",
    "drop_generation",
    "list_snapshots",
    "restore_snapshot",
    "flip_alias",
    "generation_dir",
    "list_generations",
    "open_alias",
    "rank_eval_df",
    "rank_eval_metrics",
    "resolve_index_name",
    "build_completions",
    "complete",
    "complete_df",
    "generation_created_at",
    "init_generation",
    "record_generation",
    "rollover",
    "cat_indices",
    "delete_template",
    "get_template",
    "list_templates",
    "put_template",
    "render_template",
    "search_template",
    "terms_lookup_sql",
    "validate_query",
    "aggs_dsl_df",
    "compile_dsl",
    "profile_dsl",
    "search_dsl_df",
    "search_request",
]
