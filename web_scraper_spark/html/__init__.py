from web_scraper_spark.html.dom import Element, parse_html, select, select_one, get_text  # noqa: F401
