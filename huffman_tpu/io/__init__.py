from .container import write_container, read_container, container_size

__all__ = ["write_container", "read_container", "container_size"]
