from web_scraper_spark.synth.sitegen import (  # noqa: F401
    SiteConfig,
    build_site,
    render_page,
    build_pages_df,
    build_robots_df,
    seed_urls,
)
