"""Source adapters: driver test tables, remote-index fixtures, JSON feeds."""
