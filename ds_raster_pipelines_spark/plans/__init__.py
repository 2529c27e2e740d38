"""End-to-end pipeline builders (logical-plan composition, no execution)."""
