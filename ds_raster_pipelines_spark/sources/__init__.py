"""Sources & decode kernels: Arrow-batched tile decode, catalog scans,
multimodal plumbing (binary columns + typed metadata)."""
