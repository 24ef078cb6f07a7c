from .container import (
    container_kind,
    container_size,
    ils_container_size,
    read_container,
    read_ils_container,
    write_container,
    write_ils_container,
)

__all__ = [
    "container_kind",
    "container_size",
    "ils_container_size",
    "read_container",
    "read_ils_container",
    "write_container",
    "write_ils_container",
]
