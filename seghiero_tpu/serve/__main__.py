from seghiero_tpu.serve.server import main

if __name__ == "__main__":
    main()
