"""Plans: the declared query registry (driver contract), the free-SQL
query surface (Q1/Q3), and the JSON job-spec pipeline interpreter
(scheduler analog). See SURVEY.md §2.8, §3.1."""
