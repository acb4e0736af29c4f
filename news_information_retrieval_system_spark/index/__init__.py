from .build import FulltextIndex, build_index, build_positional  # noqa: F401
from .tombstones import (  # noqa: F401
    apply_tombstones,
    load_tombstones,
    purge_blocks,
    write_tombstones,
)
