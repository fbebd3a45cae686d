from .checks import QualityReport, count_duplicates, profile, run_quality_checks

__all__ = ["QualityReport", "profile", "count_duplicates", "run_quality_checks"]
