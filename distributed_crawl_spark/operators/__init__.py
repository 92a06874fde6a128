"""Frontier operators: politeness window, URL-seen filter, robots gate,
fetch join, link extraction."""
