"""Native (C) fast paths for host-side frame operations."""
