"""``python -m datapact_ray`` → the CLI, so the suite launches as a
Ray job exactly per the north rule:

    ray job submit --working-dir . -- python -m datapact_ray run \
        --config suite.yml --results-dir /data/results

(``cli.main`` owns the Ray session when run standalone; under ``ray
job submit`` the cluster is already up and ``ray.init`` attaches.)
"""

from .cli import main

if __name__ == "__main__":
    main()
