"""Rule packs — importing this module populates the default registry with all 161
reference rules (counts per pack mirror SURVEY.md §2: compare 8, field 8, string 24,
format 65, network 31, other 25)."""

from . import (  # noqa: F401
    pack_compare,
    pack_field,
    pack_format,
    pack_network,
    pack_other,
    pack_string,
)
from ..registry import default_registry

__all__ = ["default_registry"]
