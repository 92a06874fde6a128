# sources: external-input scans (SURVEY.md §2.1)
