"""Multi-statement pipeline choreography (SURVEY.md §3.1 steps 5-9)."""
