# sinks: export/report emitters (SURVEY.md §2.2)
